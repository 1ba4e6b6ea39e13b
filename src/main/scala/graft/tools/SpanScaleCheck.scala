package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.SpanDedup
import graft.plans.SketchFunctions

/** Skew-flood evidence for the span-dedup join shape (the AnnScaleCheck
  * discipline applied to SpanDedup, r7 judge item #6).
  *
  * The adversarial input for span dedup is a BOILERPLATE GRAM — one
  * n-gram shared by every document (license headers, nav chrome,
  * template fragments do exactly this at corpus scale). Two ways to
  * flag the duplicated occurrences:
  *
  *   - NAIVE pair join: `occ ⋈ occ ON gh` to ask "which other docs
  *     share this gram" — the flood gram alone produces n² rows
  *     (10¹⁰ at n = 10⁵), the classic skew-join explosion;
  *   - SpanDedup's LEFT SEMI against the ≥2-distinct-docs gram set —
  *     each occurrence row survives AT MOST ONCE, so the flagged frame
  *     is O(occurrences) = n rows no matter how many documents share
  *     the gram. Row multiplication is impossible by construction.
  *
  * This tool builds a synthetic corpus (shared 8-token boilerplate head
  * + a unique tail per doc), counts both shapes' intermediate rows, and
  * times the full coverage operator — the naive join at sizes where its
  * quadratic blowup is already visible but still runnable, the semi
  * path up to 10× further to show flat per-row cost. Results are
  * recorded in PLANS.md (scale-evidence section).
  *
  * Run: `sbt "runMain graft.tools.SpanScaleCheck [nSemiMax] [nNaiveMax]"`. */
object SpanScaleCheck {

  /** Every doc carries the same 8-token boilerplate head once, then a
    * unique 4-token tail — deterministic, no data files. */
  private def flooded(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id").as("doc_id"),
      concat(lit("b0 b1 b2 b3 b4 b5 b6 b7 u"),
        col("id").cast("string"), lit(" v"), col("id").cast("string"),
        lit(" w"), col("id").cast("string")).as("text"))

  /** The (doc_id, pos, gh) occurrence stream — the tool's copy of the
    * operator's gram stage, built from the same public expressions. */
  private def occ(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
        SketchFunctions.portableNgramHashes(
          TextAnalysis.tokens(col("text")), n).as("ghs"))
      .select(col("doc_id"), posexplode(col("ghs")).as(Seq("pos", "gh")))

  def main(args: Array[String]): Unit = {
    val nSemiMax = args.headOption.map(_.toLong).getOrElse(100000L)
    val nNaiveMax = args.drop(1).headOption.map(_.toLong).getOrElse(10000L)
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
    // warm-up
    flooded(spark, 1000).agg(sum(length(col("text")))).collect()

    println(s"SPAN_SCALE cpus=$cpus (flood: one 8-gram shared by ALL n docs)")
    // naive pair join: quadratic in the flood size
    Iterator.iterate((nNaiveMax / 10).max(1L))(_ * 3).takeWhile(_ <= nNaiveMax).foreach { n =>
      val o = occ(flooded(spark, n), 8).localCheckpoint(true)
      val (sec, rows) = time(
        o.select("gh", "doc_id").join(o.select(col("gh"), col("doc_id").as("other")), "gh")
          .filter(col("doc_id") =!= col("other")).count())
      println(f"  naive occ-pair join  n=$n%7d  pair_rows=$rows%12d  $sec%7.2f s")
    }
    // semi path: flagged rows stay O(occurrences), coverage stays linear
    Iterator.iterate((nSemiMax / 100).max(1L))(_ * 10).takeWhile(_ <= nSemiMax).foreach { n =>
      val docs = flooded(spark, n)
      val o = occ(docs, 8)
      val dup = o.select("gh", "doc_id").distinct()
        .groupBy("gh").agg(count(lit(1)).as("nd")).filter(col("nd") >= 2).select("gh")
      val (fsec, flagged) = time(o.join(dup, Seq("gh"), "left_semi").count())
      val (csec, covered) = time(
        SpanDedup.dupSpanCoverage(docs, "text", "doc_id", n = 8)
          .agg(count(lit(1)), sum("covered_tokens")).head().getLong(1))
      println(f"  semi flagged frame   n=$n%7d  flagged_rows=$flagged%10d  $fsec%7.2f s" +
        f"  full coverage: $csec%7.2f s  covered_tokens=$covered%d")
    }
    spark.stop()
  }
}
