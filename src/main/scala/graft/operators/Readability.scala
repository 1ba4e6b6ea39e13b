package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** FLESCH READING-EASE profiling — the classic readability screen
  * (206.835 − 1.015·words/sentence − 84.6·syllables/word) as a corpus
  * curation signal: garbled or boilerplate text scores far outside the
  * human band, and per-source means shift when a feed's register
  * changes. Counting is fully structural, no models:
  *
  *   - words: the shared tokenizer ([[TextAnalysis.tokenCount]]);
  *   - sentences: runs of sentence-final punctuation ([.!?]+), min 1;
  *   - syllables: vowel-group runs ([aeiouy]+ on the lowercased text) —
  *     the standard heuristic applied corpus-wide (whitespace already
  *     breaks groups at word boundaries), min 1.
  *
  * The formula's rationals are quantized to milli-units with truncating
  * division at each of the three steps (wps, spw, then the weighted
  * subtraction) — documented, deterministic, identical in both engines;
  * a milli-point of quantization is noise against the heuristic's own
  * error. Scale shape: scan-side counting projections, one aggregate
  * per group. Empty docs (0 words) are excluded and reported. */
object Readability {

  /** Per-group Flesch profile: n_docs, n_empty (excluded), mean score
    * (milli-points, Σ DIV n), share of docs in the standard bands —
    * easy (≥ 70), plain (30–70), hard (< 30). */
  def fleschBySource(
      docs: DataFrame,
      textCol: String,
      groupCol: String
  ): DataFrame = {
    // separator-run counting: len(split(x, re, -1)) - 1 keeps trailing
    // empties in BOTH engines, so a doc ending in '.' counts the run
    val sentences = greatest(
      size(split(col(textCol), "[.!?]+", -1)) - 1, lit(1)).cast("long")
    val syllables = greatest(
      size(split(lower(col(textCol)), "[aeiouy]+", -1)) - 1, lit(1)).cast("long")
    val scored = docs.select(col(groupCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("w"),
        sentences.as("s"), syllables.as("sy"))
      .withColumn("wps_milli", expr("1000 * w DIV s"))
      .withColumn("spw_milli", when(col("w") > 0, expr("1000 * sy DIV w")))
      .withColumn("score_milli", when(col("w") > 0,
        lit(206835L) - expr("1015 * wps_milli DIV 1000")
          - expr("84600 * spw_milli DIV 1000")))
    scored.groupBy(col(groupCol))
      .agg(
        sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("w") > 0, 0L).otherwise(1L)).as("n_empty"),
        coalesce(expr("sum(score_milli) DIV sum(CASE WHEN w > 0 THEN 1 ELSE 0 END)"),
          lit(0L)).as("mean_score_milli"),
        sum(when(col("score_milli") >= 70000L, 1L).otherwise(0L)).as("n_easy"),
        sum(when(col("score_milli") < 30000L, 1L).otherwise(0L)).as("n_hard"))
      .orderBy(col(groupCol))
  }
}
