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

    def strong = {
      def tb(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
      tb("orders")
        .join(tb("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("cust"),
          concat(lit("s"), col("l_suppkey")).as("supp"))
        .distinct()
    }
    def strongInt = {
      def tb(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")
      tb("orders")
        .join(tb("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("cust"),
          (col("l_suppkey") * 2 + 1).as("supp"))
        .distinct()
    }
    for (rep <- 1 to 2) {
      val edges = t(s"edge_build rep$rep") { strong.localCheckpoint(true) }
      t(s"kcore rep$rep") {
        graft.operators.Graph.kCore(edges, "cust", "supp", k = 46).count()
      }
      val edgesI = t(s"edge_build_int rep$rep") { strongInt.localCheckpoint(true) }
      t(s"kcore_int rep$rep") {
        graft.operators.Graph.kCore(edgesI, "cust", "supp", k = 46).count()
      }
    }
    // round count visibility: replicate the double-step probe loop
    locally {
      val edges = strong.localCheckpoint(true)
      println(s"[probe] strong_edges=${edges.count()}")
      var sym = t("sym_build") {
        edges.select(col("cust").as("a"), col("supp").as("b"))
          .unionAll(edges.select(col("supp").as("a"), col("cust").as("b")))
          .filter(col("a") =!= col("b"))
          .repartition(col("a")).distinct().localCheckpoint(true)
      }
      println(s"[probe] sym_edges=${sym.count()}")
      t("final_agg") {
        sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("core_degree"))
          .orderBy("node").count()
      }
      def subK(g: org.apache.spark.sql.DataFrame) =
        g.groupBy(col("a").as("n")).agg(count(lit(1)).as("d"))
          .filter(col("d") < 46).select("n")
      def peel(g: org.apache.spark.sql.DataFrame, bad: org.apache.spark.sql.DataFrame) =
        g.join(bad.withColumnRenamed("n", "a"), Seq("a"), "left_anti")
          .join(bad.withColumnRenamed("n", "b"), Seq("b"), "left_anti")
          .select("a", "b")
      var round = 0
      var done = false
      while (!done && round < 50) {
        val bad = subK(sym).localCheckpoint(false)
        val t0 = System.nanoTime()
        val n = bad.count()
        println(f"[probe] round=$round bad=$n probe=${(System.nanoTime() - t0) / 1e9}%.3f s")
        if (n == 0) done = true
        else {
          val sym1 = peel(sym, bad).localCheckpoint(false)
          val bad1 = subK(sym1).localCheckpoint(false)
          sym = peel(sym1, bad1).localCheckpoint(false)
          round += 1
        }
      }
    }
    spark.stop()
  }
}
