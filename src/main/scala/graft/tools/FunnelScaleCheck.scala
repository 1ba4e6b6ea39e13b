package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Whale-flood evidence for the exact funnel's join shape (the
  * SpanScaleCheck discipline applied to `Funnel.windowFunnelExact`).
  *
  * The adversarial input for an all-anchors funnel is a WHALE — one
  * user carrying a huge share of step-1 events (bots, load tests and
  * SDK retry storms do exactly this). Joining step events to anchors on
  * the user key alone pairs EVERY whale anchor with EVERY whale step
  * event before the window filter can run — a·e rows for one user,
  * quadratic in total activity. The operator instead co-locates on
  * (user, windowMs-bucket): each anchor explodes into the ≤2 buckets
  * its window can touch, so an anchor only meets the events inside its
  * own window span and the join frame is O(anchors × events-per-window)
  * no matter how active the whale is.
  *
  * This tool builds a whale timeline (n step-1 + n step-2 events spread
  * uniformly over 100 windows), counts both join shapes' intermediate
  * rows, and times the full operator — the naive shape at sizes where
  * its quadratic blowup is visible but runnable, the bucketed path 10×
  * further. Numbers land in PLANS.md (scale-evidence section).
  *
  * Run: `sbt "runMain graft.tools.FunnelScaleCheck [nBucketMax] [nNaiveMax]"`. */
object FunnelScaleCheck {

  private val W = 1000L // funnel window ms; whale spans 100 windows

  /** One whale: n s1 events and n s2 events interleaved at a FIXED
    * density of 10 events/window each (the whale stays active longer as
    * n grows — the realistic bot shape: bounded rate, unbounded
    * duration), plus 1000 background users with 2 events each (so the
    * user ledger is not degenerate). Fixed density makes the bucketed
    * join's row count LINEAR in n while the naive user-key join stays
    * quadratic. */
  private def whale(spark: SparkSession, n: Long): DataFrame = {
    val span = (n / 10L).max(1L) * W
    val w1 = spark.range(n).select(lit(0L).as("user_id"), lit("s1").as("etype"),
      expr(s"id * $span DIV $n").as("ms"))
    val w2 = spark.range(n).select(lit(0L).as("user_id"), lit("s2").as("etype"),
      expr(s"id * $span DIV $n + 7").as("ms"))
    val bgBase = spark.range(1, 1001).select(col("id").as("user_id"),
      (col("id") * 13L % span).as("m"))
    val bg = bgBase.select(col("user_id"), lit("s1").as("etype"), col("m").as("ms"))
      .unionByName(bgBase.select(col("user_id"), lit("s2").as("etype"),
        (col("m") + 3L).as("ms")))
    w1.unionByName(w2).unionByName(bg)
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
  }

  def main(args: Array[String]): Unit = {
    val nBucketMax = args.headOption.map(_.toLong).getOrElse(300000L)
    val nNaiveMax = args.drop(1).headOption.map(_.toLong).getOrElse(30000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    whale(spark, 100).count() // warm-up

    println(s"FUNNEL_SCALE cpus=$cpus window=${W}ms " +
      "(whale: one user, n anchors + n step-2 events at 10/window fixed density)")
    // naive shape: anchors x step events paired on the user key alone
    Iterator.iterate((nNaiveMax / 9).max(1L))(_ * 3).takeWhile(_ <= nNaiveMax).foreach { n =>
      val base = whale(spark, n)
        .select(col("user_id"), col("etype"), unix_millis(col("ts")).as("ms"))
        .localCheckpoint(true)
      val anchors = base.filter(col("etype") === "s1")
        .select(col("user_id"), col("ms").as("t1"))
      val (sec, rows) = time(
        base.filter(col("etype") === "s2").join(anchors, Seq("user_id")).count())
      println(f"  naive user-key join    n=$n%7d  pair_rows=$rows%12d  $sec%7.2f s")
    }
    // bucketed shape (the operator's): anchors meet only their window span
    Iterator.iterate((nBucketMax / 100).max(1L))(_ * 10).takeWhile(_ <= nBucketMax).foreach { n =>
      val base = whale(spark, n)
        .select(col("user_id"), col("etype"), unix_millis(col("ts")).as("ms"))
        .withColumn("bkt", expr(s"ms DIV ${W}L"))
        .localCheckpoint(true)
      val anchorsB = base.filter(col("etype") === "s1")
        .select(col("user_id"), col("ms").as("t1"))
        .withColumn("bkt", explode(expr(
          s"sequence(t1 DIV ${W}L, (t1 + ${W}L) DIV ${W}L)")))
      val (jsec, rows) = time(
        base.filter(col("etype") === "s2").join(anchorsB, Seq("user_id", "bkt")).count())
      val (osec, levels) = time(
        Funnel.windowFunnelExact(whale(spark, n), "user_id", "etype", "ts",
            Seq("s1", "s2"), W)
          .groupBy("level").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap)
      println(f"  bucketed join          n=$n%7d  pair_rows=$rows%12d  $jsec%7.2f s" +
        f"  full operator: $osec%7.2f s  levels=$levels")
    }
    spark.stop()
  }
}
