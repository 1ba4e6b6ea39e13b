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
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sweep_scale_10x",
        "/tmp/graft_sweep_scale_100x")
    for (dir <- dirs; q <- queries; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).collect().length
      println(f"[probe] $q rep$rep $dir%-36s " +
        f"${(System.nanoTime() - t0) / 1e9}%7.1f s  ($n rows)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
