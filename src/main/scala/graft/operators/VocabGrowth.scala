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
  * shuffle of vocabulary work); the only windows are (a) the document
  * prefix-sum for corpus offsets — over the DOC frame, not the token
  * stream (the standard range-partitioned prefix-sum shape), and (b) the
  * cumulative octave sum over a ≤64-row frame. Token arrays are
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
    // corpus offset of each doc = tokens before it in _id order; the
    // window runs over the doc frame (see scaladoc)
    val off = counts.withColumn("_o",
      sum(col("_t")).over(Window.orderBy(col("_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("_t"))
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
