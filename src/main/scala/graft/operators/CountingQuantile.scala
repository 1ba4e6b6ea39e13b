package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT quantiles that survive 100 TB — the third path in the repo's
  * quantile trilogy (SCALING.md "what changes at 100×"):
  *
  *   - `percentile` (q54): exact, but one task owns each group's sort —
  *     memory O(group), dies on a big group;
  *   - `approx_percentile` (q57): fixed memory, mergeable — but only a
  *     rank-error guarantee;
  *   - THIS operator: exact AND mergeable, when the value domain is
  *     DISCRETE (token counts, lengths, status codes, prices in cents,
  *     ages, stars...) — the counting-sort trick distributed: aggregate
  *     (group, value) → count (map-side combined; shuffle state is
  *     O(distinct values per group), NOT O(rows)), then read the target
  *     ranks off the cumulative count with one per-group window over the
  *     value-count table.
  *
  * Median semantics match `percentile`/`quantile_cont` 0.5 exactly: odd
  * n → the middle value; even n → the mean of the two middle values.
  * For integer-valued domains below 2^52 both formulations are exact in
  * doubles, so results hash-match across engines bit-for-bit.
  */
object CountingQuantile {

  /** Per-group exact median via value counting.
    *
    * Output: (group, n, domain_card, min_x, max_x, median) ordered by
    * the group column — `domain_card` (distinct values in the group) IS
    * the operator's memory story: post-aggregation state per group.
    * `valueCol` must be numeric with discrete semantics; values are
    * compared in their own type and the median is emitted as double. */
  def countingMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String
  ): DataFrame = {
    val counts = df
      .select(col(groupCol).as("g"), col(valueCol).as("x"))
      .filter(col("x").isNotNull)
      .groupBy("g", "x").agg(count(lit(1)).as("cnt"))
    val byG = Window.partitionBy("g")
    val cum = counts
      .withColumn("cum",
        sum("cnt").over(byG.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("cnt").over(byG))
    // target ranks: odd n -> both (n+1)/2; even n -> n/2 and n/2+1
    val r1 = expr("(n + 1) DIV 2")
    val r2 = expr("n DIV 2 + 1")
    def valueAt(r: Column): Column = min(when(col("cum") >= r, col("x")))
    cum.groupBy("g")
      .agg(max(col("n")).as("n"),
        count(lit(1)).as("domain_card"),
        min(col("x")).cast("double").as("min_x"),
        max(col("x")).cast("double").as("max_x"),
        ((valueAt(r1) + valueAt(r2)).cast("double") / 2.0).as("median"))
      .withColumnRenamed("g", groupCol)
      .orderBy(groupCol)
  }

  /** Per-group exact TYPE-1 quantiles (x at rank ⌈q·n⌉) via value
    * counting — [[countingMedian]] generalized to many keys and many
    * probabilities at once: the SLO table (p50/p90/p99 per service per
    * day) computed exactly and mergeably. Integral `valueCol` only —
    * quantize money to cents first (the house DECIMAL(12,2)·100 move).
    *
    * Scale shape identical to [[countingMedian]]: one (keys, value)
    * grain aggregate (map-side combined), windows over per-key
    * DOMAIN-sized partitions, one final aggregate per key. The state
    * per key is its distinct-value count — bounded for cents/ms
    * domains regardless of row count.
    *
    * @param qs (columnName, probability-per-myriad) pairs, e.g.
    *           Seq(("p50", 5000L), ("p90", 9000L))
    */
  def countingQuantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      qs: Seq[(String, Long)]
  ): DataFrame = {
    val gs = groupCols.map(col)
    quantilesFromCounts(
      df.select(gs :+ col(valueCol).cast("long").as("x"): _*)
        .filter(col("x").isNotNull)
        .groupBy(gs :+ col("x"): _*).agg(count(lit(1)).as("cnt")),
      groupCols, qs)
  }

  /** The mergeable counting-quantile STATE is the (keys, x, cnt) cell
    * frame — plain sums, so batches merge with [[mergeCounts]] and a
    * streaming aggregation maintains it live; this finish answers any
    * probability from the stored cells without rescanning rows (the
    * [[graft.operators.Survival.bucketCounts]] pattern). */
  def quantilesFromCounts(
      counts: DataFrame,
      groupCols: Seq[String],
      qs: Seq[(String, Long)]
  ): DataFrame = {
    require(groupCols.nonEmpty && qs.nonEmpty, "need keys and quantiles")
    require(qs.forall { case (_, q) => q >= 1 && q <= 10000 },
      "quantiles in (0, 1] per-myriad")
    val gs = groupCols.map(col)
    val byG = Window.partitionBy(gs: _*)
    val cum = counts
      .withColumn("cum", sum("cnt").over(
        byG.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum("cnt").over(byG))
    val qCols = qs.map { case (name, qPm) =>
      // ceil(q·n) in integers: (n·q + 9999) DIV 10000
      min(when(col("cum") >= expr(s"(n * $qPm + 9999) DIV 10000"), col("x")))
        .as(name)
    }
    cum.groupBy(gs: _*)
      .agg(max(col("n")).as("n"), qCols: _*)
      .orderBy(gs: _*)
  }

  /** Merge two (keys, x, cnt) cell frames: per-cell sums — exact,
    * associative, commutative; the store/stream merge primitive. */
  def mergeCounts(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("x")): _*)
      .agg(sum(col("cnt")).as("cnt"))
}
