package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.SketchFunctions

/** DISTINCT-COUNT ESTIMATION via HYPERLOGLOG (Flajolet et al., AofA 2007)
  * — the industry-standard fixed-memory cardinality sketch, complementing
  * [[Cardinality]]'s KMV: m = 2^p registers of one byte each (vs KMV's k
  * longs), standard error 1.04/√m, and a union that is plain element-wise
  * `max` — the property that makes per-segment/per-day/per-executor
  * sketches mergeable without touching the data again.
  *
  * Register derivation is INTEGER-EXACT and portable: from the md5-slice
  * hash `h`, bucket `idx = h & (m−1)` (low p bits), remainder
  * `w = h >>> p` (the top 64−p bits), and rank = leading-zero count of w
  * within 64−p bits, plus one:
  *   rank = (65 − p) − bitlen(w),  bitlen via `length(bin(w))`, w = 0 →
  *   rank = 65 − p
  * (`bin` renders the minimal binary string of a non-negative BIGINT in
  * both engines — an integer bit-length with no log2 rounding hazard).
  *
  * The harmonic mean is kept EXACT until the final division: each term
  * 2^(−reg) is scaled by 2^(65−p) to the integer 2^(65−p−reg), summed in
  * decimal(38,0) (HUGEINT on the oracle side — sums overflow int64 when
  * most registers hold rank 1), and empty registers contribute
  * V · 2^(65−p). The estimate divides two identical doubles —
  * correctly-rounded cast and division, so bit-identical cross-engine:
  *   E = alpha_m · m² · 2^(65−p) / S_scaled.
  * Below the 2.5m small-range threshold with empty registers, linear
  * counting `m·ln(m/V)` applies; its `ln` carries the q70 ≤1-ulp caveat
  * (absorbed by the ±0.5 round except within an ulp of a half-count
  * boundary — data-dependent, same caveat family as q70/q90).
  *
  * Scale shape: one scan; map-side partial `max` per (segment, idx) means
  * the shuffle carries at most m · segments · partitions bytes-as-rows —
  * never values. The '__all__' row merges the per-segment registers with
  * a second tiny aggregation (≤ m · segments rows), demonstrating sketch
  * union without rescanning. */
object Hll {

  /** alpha_m · m² · 2^(65−p) as one double constant — the numerator of
    * the raw estimate, computed once here and replayed as the identical
    * literal in oracle SQL (Double.toString round-trips). */
  def scaleConst(p: Int): Double = {
    val m = (1 << p).toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * math.pow(2.0, 65 - p).toLong.toDouble
  }

  /** `(segment, idx, reg)` — occupied HLL registers per segment (empty
    * registers are absent rows; estimators must count them as V). */
  def registers(
      df: DataFrame, valueCol: String, segmentCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 14, s"p in [4,14], got $p")
    val maxRank = 65 - p
    val h = element_at(
      SketchFunctions.portableHash64(array(col(valueCol).cast("string"))), 1)
    val w = shiftrightunsigned(h, p)
    df.filter(col(valueCol).isNotNull)
      .select(col(segmentCol).as("segment"),
        h.bitwiseAND(lit((1L << p) - 1L)).as("idx"), w.as("w"))
      .withColumn("rank",
        when(col("w") === 0L, lit(maxRank))
          .otherwise(lit(maxRank) - length(bin(col("w")))).cast("int"))
      .groupBy("segment", "idx")
      .agg(max("rank").as("reg"))
  }

  /** `(segment, hll_est)` from a register table (any number of segments;
    * registers already merged per (segment, idx)). */
  def estimate(regs: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val maxRank = 65 - p
    val term = expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $maxRank - reg) AS DECIMAL(38,0))")
    val eRaw = lit(scaleConst(p)) / col("s_scaled").cast("double")
    regs.groupBy("segment")
      .agg(sum(term).as("s_present"), count(lit(1)).as("filled"))
      .withColumn("v", lit(m) - col("filled"))
      .withColumn("s_scaled", col("s_present") +
        col("v").cast("decimal(38,0)") * lit(1L << maxRank).cast("decimal(38,0)"))
      .withColumn("hll_est",
        when(col("v") > 0L && eRaw <= lit(2.5 * m),
          floor(lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")) + 0.5))
          .otherwise(floor(eRaw + 0.5)).cast("long"))
      .select("segment", "hll_est")
  }

  /** Per-segment estimates with the exact count attached for audit, plus
    * a `totalSegment` row estimated from the element-wise-max MERGE of
    * the per-segment registers: `(segment, hll_est, exact_distinct)` —
    * the [[Cardinality.distinctEstimate]] shape with HLL mechanics. */
  def distinctEstimate(
      df: DataFrame,
      valueCol: String,
      segmentCol: String,
      p: Int,
      totalSegment: String = "__all__"
  ): DataFrame = {
    val nn = df.filter(col(valueCol).isNotNull)
    val regs = registers(df, valueCol, segmentCol, p)
      .localCheckpoint(true) // consumed twice: per-segment + merge
    val perSeg = estimate(regs, p)
      .join(nn.groupBy(col(segmentCol).as("segment"))
        .agg(countDistinct(col(valueCol)).as("exact_distinct")), Seq("segment"))
    val merged = estimate(
      regs.groupBy("idx").agg(max("reg").as("reg"))
        .withColumn("segment", lit(totalSegment)), p)
      .crossJoin(nn.agg(countDistinct(col(valueCol)).as("exact_distinct")))
    perSeg.unionByName(merged)
      .select(col("segment"), col("hll_est"), col("exact_distinct"))
  }
}
