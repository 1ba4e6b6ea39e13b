package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{KmvSketch, SketchFunctions}

/** DISTINCT-COUNT ESTIMATION via KMV sketches ([[graft.plans.KmvSketch]]):
  * per-segment cardinalities ("distinct users per event type") in bounded
  * memory, mergeable across segments/batches/clusters — the sketch answer
  * to `countDistinct`'s distinct-sized shuffle.
  *
  * Estimator: hashes are uniform in [0, 2^62); with ≥ k distinct values
  * the estimate is `floor((k−1) · 2^62 / u_k)` for u_k the k-th smallest
  * distinct hash (expectation-unbiased form of Bar-Yossef et al.; relative
  * error ~1/√k). With fewer than k distinct values the sketch holds the
  * whole distinct set and the count is EXACT — the sketch degrades to the
  * truth, never below it. The division runs in double: (k−1)·2^62 is
  * exactly representable (≤ 6 significant bits) and IEEE division/floor
  * of identical inputs is identical in every engine, so the estimate
  * replays bit-exactly in SQL — no quantization caveat.
  *
  * PORTABILITY: value → md5-slice hash of its decimal string, logically
  * shifted to [0, 2^62) (`h >>> 2`; the oracle replays it as
  * `(h >> 2) & (2^62−1)` — arithmetic shift + mask ≡ logical shift).
  *
  * Scale shape: one scan; the aggregation state is ≤ k longs per segment
  * with map-side partial aggregation, so the shuffle carries at most
  * k · segments · partitions longs — never the distinct values
  * themselves. The merged-total row reuses the per-segment sketches
  * (k smallest of their union ≡ the global k smallest), demonstrating
  * sketch union without rescanning the data.
  */
object Cardinality {

  /** Hash space size 2^62 as an exact double (and the shift that maps
    * the signed md5 slice into it). */
  private val SpaceD = 4611686018427387904.0

  /** Portable uniform hash of any value into [0, 2^62): md5-slice of the
    * value's string form, logically shifted right 2. Null in → null out
    * (callers filter). */
  def kmvHash(c: Column): Column =
    shiftrightunsigned(
      element_at(SketchFunctions.portableHash64(array(c.cast("string"))), 1), 2)

  /** `(segment, kmv)` — one KMV sketch (sorted `array<long>`, size ≤ k)
    * per distinct value of `segmentCol`, over the hashes of
    * `valueCol`'s non-null values. */
  def kmvSketches(
      df: DataFrame, valueCol: String, segmentCol: String, k: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(segmentCol).as("segment"), kmvHash(col(valueCol)).as("u"))
      .groupBy("segment")
      .agg(KmvSketch.kmv(col("u"), k).as("kmv"))

  /** The KMV estimate of a sketch column: exact size below k, the
    * (k−1)·2^62/u_k double-floor at and above it. `element_at` is guarded
    * by the size branch (CaseWhen evaluates lazily), and u_k = 0 — the
    * 2^-62 event that the hash's top 62 bits vanish — divides by 1
    * instead of throwing. */
  def kmvEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("long"))
      .otherwise(floor(lit((k - 1).toDouble) * lit(SpaceD) /
        greatest(element_at(kmv, k), lit(1L)).cast("double")).cast("long"))

  /** Per-segment distinct-count estimates with the exact count attached
    * for audit, plus a `totalSegment` row estimated from the MERGED
    * per-segment sketches: `(segment, kmv_est, exact_distinct)`.
    * The exact column is the demo's oracle anchor; the at-scale
    * deployment drops it and keeps only the sketch path. */
  def distinctEstimate(
      df: DataFrame,
      valueCol: String,
      segmentCol: String,
      k: Int,
      totalSegment: String = "__all__"
  ): DataFrame = {
    val nn = df.filter(col(valueCol).isNotNull)
    val sketches = kmvSketches(df, valueCol, segmentCol, k)
      .localCheckpoint(true) // consumed twice: per-segment rows + merge
    val perSeg = sketches.select(col("segment"), kmvEstimate(col("kmv"), k).as("kmv_est"))
      .join(nn.groupBy(col(segmentCol).as("segment"))
        .agg(countDistinct(col(valueCol)).as("exact_distinct")), Seq("segment"))
    val merged = sketches.select(explode(col("kmv")).as("u"))
      .agg(KmvSketch.kmv(col("u"), k).as("kmv"))
      .select(lit(totalSegment).as("segment"), kmvEstimate(col("kmv"), k).as("kmv_est"))
      .crossJoin(nn.agg(countDistinct(col(valueCol)).as("exact_distinct")))
    perSeg.unionByName(merged)
      .select(col("segment"), col("kmv_est"), col("exact_distinct"))
  }

  /** SKETCH SET ALGEBRA: estimated overlap of every segment pair from
    * their KMV sketches alone — `(seg_a, seg_b, est_a, est_b, est_union,
    * est_intersect)` for seg_a < seg_b. The union sketch is the k
    * smallest of the two sketches' union (exactly the sketch the merged
    * stream would produce — KMV's closure property), and
    * |A∩B| = |A| + |B| − |A∪B| by inclusion-exclusion, floored at 0.
    * This is how segment-overlap matrices ("how many purchase users also
    * error?") stay k·segments² work at ANY cardinality: the pair join
    * touches sketches, never user sets. Estimates inherit the ~1/√k
    * error (differences of estimates — audit against exact before
    * trusting tight overlaps). Array ops only (sort/dedupe/slice of ≤ 2k
    * element arrays), so the whole algebra replays in SQL. */
  def pairwiseOverlap(df: DataFrame, valueCol: String, segmentCol: String, k: Int): DataFrame = {
    val sk = kmvSketches(df, valueCol, segmentCol, k)
      .localCheckpoint(true) // self-joined
    val a = sk.select(col("segment").as("seg_a"), col("kmv").as("kmv_a"))
    val b = sk.select(col("segment").as("seg_b"), col("kmv").as("kmv_b"))
    val unionSketch = slice(array_sort(array_union(col("kmv_a"), col("kmv_b"))), 1, k)
    a.join(b, col("seg_a") < col("seg_b"))
      .withColumn("est_a", kmvEstimate(col("kmv_a"), k))
      .withColumn("est_b", kmvEstimate(col("kmv_b"), k))
      .withColumn("est_union", kmvEstimate(unionSketch, k))
      .withColumn("est_intersect",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .select("seg_a", "seg_b", "est_a", "est_b", "est_union", "est_intersect")
  }

  /** TRAILING-WINDOW DISTINCT ROLLUP — the pre-aggregated sketch pattern
    * the reference's own warehouse is built on (ClickHouse
    * AggregatingMergeTree: store one sketch STATE per day, answer any
    * window by merging states — never rescan events): per integer-day
    * KMV sketches, merged over a trailing `windowDays` value-range
    * window via KMV's closure property (k smallest of the union IS the
    * union's sketch), with the exact trailing distinct attached for
    * audit.
    *
    * Scale shape: the events scan collapses to ≤ k longs per day
    * (map-side combined); everything after — the trailing merge window,
    * the estimate — runs over the DAYS-sized sketch table (a single
    * ordered window over days-count rows, the q85 audit-rank class).
    * The exact audit column explodes each distinct (day, value) pair
    * into the ≤ `windowDays` windows it serves — an equi-join shape, no
    * inequality join — and is the demo anchor; the at-scale deployment
    * keeps only the sketch path. */
  def trailingDistinct(
      df: DataFrame,
      valueCol: String,
      dayCol: String,
      k: Int,
      windowDays: Int = 7
  ): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val nn = df.filter(col(valueCol).isNotNull)
    val daily = kmvSketches(nn, valueCol, dayCol, k)
      .withColumnRenamed("segment", "day")
      .localCheckpoint(true) // consumed by the window AND the audit join
    val est = trailingDistinctFromStates(daily, k, windowDays)
    val du = nn.select(col(dayCol).as("d"), col(valueCol).as("v")).distinct()
    val contrib = du.withColumn("day",
      explode(sequence(col("d"), col("d") + lit(windowDays - 1))))
    val exact = contrib.join(daily.select("day"), Seq("day"), "left_semi")
      .groupBy("day").agg(countDistinct(col("v")).as("exact_trailing_distinct"))
    est.join(exact, Seq("day")).orderBy("day")
  }

  /** MERGE two per-day KMV state tables `(day, kmv)` into one — the
    * AggregatingMergeTree compaction step: days present in both sides
    * combine by KMV closure (k smallest distinct of the union IS the
    * union's sketch), days in one side pass through. Associative and
    * commutative, so batches can land in any order and the accumulated
    * state equals the state one all-at-once build would produce —
    * which is what makes the stored table SERVABLE without rescanning
    * events (exercised end-to-end by q136 via
    * [[graft.sink.SnapshotSink]]).
    *
    * Scale shape: the explode is bounded by k per input state row, so
    * the merge shuffles ≤ k longs per (day, side) — state-sized,
    * never data-sized. */
  def mergeKmvStates(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.select(col("day"), col("kmv"))
      .unionByName(b.select(col("day"), col("kmv")))
      .select(col("day"), explode(col("kmv")).as("u"))
      .groupBy("day")
      .agg(KmvSketch.kmv(col("u"), k).as("kmv"))

  /** SERVE the trailing-distinct rollup from a STORED per-day KMV state
    * table `(day, kmv)` — the read side of the pattern: no events scan
    * anywhere in this plan; every window is answered by merging ≤
    * `windowDays` state rows over a days-sized ordered window. Output
    * `(day, n_days, kmv_trailing_est)` — no exact audit column, because
    * the store deliberately does NOT retain the distinct values (that's
    * the point); the oracle recomputes from raw events and matches by
    * KMV's closure property. */
  def trailingDistinctFromStates(
      states: DataFrame, k: Int, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val w = Window.orderBy("day").rangeBetween(-(windowDays - 1), 0)
    states
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("merged",
        slice(array_sort(array_distinct(flatten(collect_list(col("kmv")).over(w)))), 1, k))
      .select(col("day"), col("n_days"),
        kmvEstimate(col("merged"), k).as("kmv_trailing_est"))
  }
}
