package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** VOCABULARY GROWTH CURVE (Heaps'/Herdan's law): V(n) — distinct types
  * seen in the first n running tokens — sampled at token-count octaves
  * n = 2^k. The corpus-health diagnostic behind tokenizer sizing and
  * dedup QA: a healthy natural corpus grows V(n) ≈ K·n^β (β ≈ 0.5–0.7,
  * a straight line across octaves on the log-log curve this emits);
  * heavy boilerplate/duplication bends it flat, synthetic/garbage text
  * bends it toward V(n) ≈ n.
  *
  * Exactness: no logarithms are evaluated in floating point — a token's
  * octave is the bit length of (first_pos − 1) (`length(bin(x))`, integer
  * in both engines), so every row is integer counts and the type-token
  * ratio is truncating per-myriad division.
  *
  * Scale shape: one tokenize pass; first-occurrence positions come from
  * a min-aggregate keyed on the token (map-side combined — the natural
  * shuffle of vocabulary work). The document-offset prefix sum is the
  * TWO-PHASE range-partitioned form (no data-sized frame ever ordered
  * under one global window): docs range-partition by id, each partition
  * running-sums locally under a PARTITIONED window, and the
  * per-partition totals — a frame bounded by the partition COUNT, not
  * the data — cumulate on the driver-sized frame and broadcast-join
  * back as offsets. The only unpartitioned windows left are over that
  * partition-count frame and the ≤64-row octave frame. Token arrays are
  * checkpointed before the two consumers so documents tokenize once.
  *
  * Output: one row per octave k that introduced new vocabulary —
  * `prefix_tokens` = min(2^k, N), `new_types`, cumulative `vocab` =
  * V(prefix_tokens), `ttr_pm`, and the corpus totals for context.
  */
object VocabGrowth {

  def heapsCurve(docs: DataFrame, idCol: String, tokens: Column): DataFrame = {
    val toked = docs.select(col(idCol).as("_id"), tokens.as("_tk"))
      .localCheckpoint(true) // counts + positions: tokenize once
    val counts = toked.select(col("_id"), size(col("_tk")).cast("long").as("_t"))
    // corpus offset of each doc = tokens before it in _id order, via the
    // two-phase range-partitioned prefix sum (see scaladoc). Phase 1:
    // range-partition by _id (ranges ARE the global order) and running-sum
    // within each partition under a window PARTITIONED by the physical
    // partition id — per-group size is bounded by the range-partition
    // size, never the corpus. The checkpoint pins the sampled range
    // boundaries: _pid must mean the same partition in both phases.
    val local = counts.repartitionByRange(col("_id"))
      .withColumn("_pid", spark_partition_id())
      .withColumn("_ls",
        sum(col("_t")).over(Window.partitionBy(col("_pid")).orderBy(col("_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true)
    // Phase 2: per-partition totals collapse to one row per partition —
    // a frame bounded by the partition COUNT (32 locally, O(cluster) at
    // scale) — so the cumulative-offset window over it is benign, and
    // the offsets broadcast back.
    val partOff = local.groupBy(col("_pid")).agg(sum(col("_t")).as("_pt"))
      .withColumn("_po",
        sum(col("_pt")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("_pt"))
      .select(col("_pid"), col("_po"))
    val off = local.join(broadcast(partOff), "_pid")
      .select(col("_id"), col("_t"),
        (col("_po") + col("_ls") - col("_t")).as("_o"))
    val firstPos = toked.join(off, "_id")
      .select(posexplode(col("_tk")).as(Seq("_p", "token")), col("_o"))
      .groupBy(col("token"))
      .agg(min(col("_o") + col("_p") + 1L).as("_fp")) // 1-based position
    val octave = firstPos.withColumn("k",
      when(col("_fp") <= 1L, 0).otherwise(length(bin(col("_fp") - 1L))))
    octave.groupBy(col("k")).agg(count(lit(1)).as("new_types"))
      .crossJoin(counts.agg(sum(col("_t")).as("n_tokens")))
      .withColumn("prefix_tokens",
        least(expr("shiftleft(CAST(1 AS BIGINT), k)"), col("n_tokens")))
      .withColumn("vocab",
        sum(col("new_types")).over(Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("k").cast("long").as("k"), col("prefix_tokens"),
        col("new_types"), col("vocab"),
        expr("vocab * 10000 DIV prefix_tokens").as("ttr_pm"),
        col("n_tokens"))
      .orderBy(col("k"))
  }
}
