package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev-only timing probe with scheduler-level breakdown (guide §1: decide
  * whether a slow query is overhead-bound — many tiny jobs/stages — or
  * compute-bound, before touching it). For each named query it reports
  * wall seconds, job/stage/task counts, summed executor task time, summed
  * GC time, and summed shuffle bytes, via a SparkListener. Run:
  *   SPARK_GRAFT_PROBE_QUERIES=q250_bfs_layers,... \
  *     scripts/graft-java.sh graft.tools.JobStatsProbe [sfDir]
  * Not part of any gate; mirrors Bench's session config and count() action
  * so numbers are comparable to the bench artifact. */
object JobStatsProbe {

  private final class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    @volatile var gcTimeMs = 0L
    @volatile var shuffleReadB = 0L
    @volatile var shuffleWriteB = 0L
    val trace = sys.env.get("SPARK_GRAFT_PROBE_TRACE").contains("1")
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      jobs += 1
      if (trace) {
        val ss = j.stageInfos.map(si => si.name.takeWhile(_ != '\n')).distinct
        println(s"  [job ${j.jobId}] stages=${j.stageIds.size} ${ss.mkString(" | ").take(180)}")
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      stages += 1
      if (trace) {
        val si = s.stageInfo
        val wall = for (a <- si.submissionTime; b <- si.completionTime) yield (b - a) / 1e3
        if (wall.exists(_ > 0.15))
          println(f"  [stage ${si.stageId}] wall=${wall.getOrElse(-1.0)}%6.2fs tasks=${si.numTasks} ${si.name.takeWhile(_ != '\n').take(120)}")
      }
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcTimeMs += m.jvmGCTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
      }
    }
    def reset(): Unit = synchronized {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L; gcTimeMs = 0L
      shuffleReadB = 0L; shuffleWriteB = 0L
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
    // A/B experiments: SPARK_GRAFT_PROBE_CONF="k=v;k=v" layered on top
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach { kvs =>
      kvs.split(";").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$dir/documents.parquet").count()
    catch { case _: Throwable => () }

    val queries = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "q250_bfs_layers")
      .split(",").map(_.trim).filter(_.nonEmpty)
    println(f"${"query"}%-32s rep ${"wall_s"}%8s ${"jobs"}%5s ${"stgs"}%5s " +
      f"${"tasks"}%6s ${"taskT_s"}%8s ${"gc_s"}%6s ${"shRd_MB"}%8s ${"shWr_MB"}%8s")
    for (q <- queries; rep <- 1 to reps) {
      // listener bus is async and private; a short settle keeps per-query
      // attribution honest enough for a dev probe
      Thread.sleep(300)
      acc.reset()
      val t0 = System.nanoTime()
      val r = scala.util.Try(graft.SparkEntry.queries(q)(spark, dir).count())
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      r match {
        case scala.util.Success(n) =>
          println(f"$q%-32s  $rep  $wall%8.3f ${acc.jobs}%5d ${acc.stages}%5d " +
            f"${acc.tasks}%6d ${acc.taskTimeMs / 1e3}%8.2f ${acc.gcTimeMs / 1e3}%6.2f " +
            f"${acc.shuffleReadB / 1e6}%8.1f ${acc.shuffleWriteB / 1e6}%8.1f  ($n rows)")
        case scala.util.Failure(e) =>
          println(s"$q rep$rep FAILED: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(200)}")
      }
      // bench-equivalent hygiene between queries
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
