package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Interval

/** Scale evidence for the bucketed interval-overlap join (the
  * SpanScaleCheck / AnnScaleCheck discipline applied to
  * Interval.overlapJoin).
  *
  * Two claims to measure, not assert:
  *
  *   1. The NAIVE two-inequality join (`l.start < r.end AND r.start <
  *      l.end`) plans as a BroadcastNestedLoopJoin — candidate work is
  *      |L|·|R| no matter how few pairs overlap. It should go quadratic
  *      at sizes where the bucketed form is still flat.
  *   2. The BUCKETED form's candidate volume is Σ len/W + 1 exploded
  *      rows per interval, then hash-join work proportional to
  *      CO-BUCKETED candidates — so wall time grows LINEARLY when
  *      overlap density is held constant, and the bucket width W is a
  *      measurable knob: too small explodes copies, too large floods
  *      each bucket with non-overlapping candidates.
  *
  * Synthetic frames: n left intervals of length 25 every 10 ticks, n
  * right intervals of length 15 every 10 ticks (offset 5) — overlap
  * density constant (~4 partners per interval) at every n, so any
  * superlinear growth is the join's fault, not the data's.
  *
  * Run: `sbt "runMain graft.tools.OverlapScaleCheck [nBucketMax] [nNaiveMax]"`;
  * results recorded in PLANS.md (scale-evidence section). */
object OverlapScaleCheck {

  private def side(spark: SparkSession, n: Long, len: Long, off: Long,
                   idCol: String, s: String, e: String): DataFrame =
    spark.range(n).select(col("id").as(idCol),
      (col("id") * 10 + off).as(s), (col("id") * 10 + off + len).as(e))

  def main(args: Array[String]): Unit = {
    val nBucketMax = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nNaiveMax = args.drop(1).headOption.map(_.toLong).getOrElse(30000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    side(spark, 1000, 25, 0, "lid", "ls", "le").agg(sum("le")).collect()

    println(s"OVERLAP_SCALE cpus=$cpus (constant ~4 partners/interval at every n)")
    // naive inequality join: BNLJ, |L|x|R| candidate work
    Iterator.iterate((nNaiveMax / 9).max(1L))(_ * 3).takeWhile(_ <= nNaiveMax).foreach { n =>
      val l = side(spark, n, 25, 0, "lid", "ls", "le").localCheckpoint(true)
      val r = side(spark, n, 15, 5, "rid", "rs", "re").localCheckpoint(true)
      val (sec, pairs) = time(
        l.join(r, col("ls") < col("re") && col("rs") < col("le")).count())
      println(f"  naive inequality join  n=$n%8d  pairs=$pairs%10d  $sec%7.2f s")
    }
    // bucketed form: flat per-row cost; W sweep shows the knob
    Iterator.iterate((nBucketMax / 100).max(1L))(_ * 10).takeWhile(_ <= nBucketMax).foreach { n =>
      val l = side(spark, n, 25, 0, "lid", "ls", "le").localCheckpoint(true)
      val r = side(spark, n, 15, 5, "rid", "rs", "re").localCheckpoint(true)
      Seq(5L, 20L, 200L).foreach { w =>
        val candidates = // exploded copies both sides (pre-join volume)
          l.select(sum(floor((col("le") - 1) / w) - floor(col("ls") / w) + 1)).head().getLong(0) +
          r.select(sum(floor((col("re") - 1) / w) - floor(col("rs") / w) + 1)).head().getLong(0)
        val (sec, pairs) = time(
          Interval.overlapJoin(l, "ls", "le", r, "rs", "re", w).count())
        println(f"  bucketed W=$w%3d  n=$n%8d  exploded=$candidates%10d  pairs=$pairs%10d  $sec%7.2f s")
      }
    }
    spark.stop()
  }
}
