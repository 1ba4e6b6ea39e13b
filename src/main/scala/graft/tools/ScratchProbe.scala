package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing probe for loop-bound operators (dev-only; not part of
  * any gate). Run: sbt "runMain graft.tools.ScratchProbe" */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    def tb(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
    for (rep <- 1 to 2) {
      val edges = t(s"edge_build rep$rep") {
        val cust = tb("customer")
          .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        tb("orders")
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(tb("lineitem"), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("buyer"), col("l_partkey").as("part"))
          .localCheckpoint(true)
      }
      println(s"[probe] edges=${edges.count()}")
      for (it <- Seq(1, 2, 6)) {
        t(s"hits_it$it rep$rep") {
          graft.operators.Graph.hits(edges, "buyer", "part", it).count()
        }
      }
    }
    spark.stop()
  }
}
