package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for loop-bound operators (dev-only; not part of
  * any gate). Run: sbt "runMain graft.tools.ScratchProbe" */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val queries = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES",
      "q261_shared_ngrams").split(",").map(_.trim).filter(_.nonEmpty)
    // the default rungs are session-scratch corpora that a fresh
    // checkout won't have — probe whichever exist instead of letting
    // the first missing dir abort the remaining combos (round-14
    // advisor); an explicitly-passed missing dir still reports, once
    val dirs = {
      val ds = if (args.nonEmpty) args.toSeq
        else Seq("/root/testdata/sf0.1", "/tmp/graft_sweep_scale_10x",
          "/tmp/graft_sweep_scale_100x")
      val (have, missing) = ds.partition(new java.io.File(_).isDirectory)
      missing.foreach(d => println(s"[probe] SKIP $d (not a directory)"))
      have
    }
    for (dir <- dirs; q <- queries; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      scala.util.Try(graft.SparkEntry.queries(q)(spark, dir).collect().length) match {
        case scala.util.Success(n) =>
          println(f"[probe] $q rep$rep $dir%-36s " +
            f"${(System.nanoTime() - t0) / 1e9}%7.1f s  ($n rows)")
        case scala.util.Failure(e) =>
          println(f"[probe] $q rep$rep $dir%-36s FAILED: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
