package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.plans.SketchFunctions

/** HASHING-TRICK LINEAR CLASSIFIER INFERENCE — the model-based quality
  * filter of an LLM curation pipeline. The heuristic signals
  * (functions/TextAnalysis: length, stopword ratio, punct density) catch
  * boilerplate; production corpora additionally gate on a SMALL TRAINED
  * CLASSIFIER scored over every document (the FineWeb/DCLM recipe: a
  * linear model over hashed token features decides what enters the
  * training set). This module is that inference stage, built so the
  * scoring plan is exactly what a 100 TB pass needs:
  *
  *   tokenize → bucket-hash → gather weight → integer sum + bias
  *
  * one codegen'd projection per document — no shuffle, no UDF, no vocab
  * lookup join. The "hashing trick" (Weinberger et al.) replaces the
  * vocabulary file with `bucket = portable_hash(token) mod B`, making the
  * model a single dense weight vector small enough to ship as ONE plan
  * literal (`typedLit(Array[Long])` — a single ArrayData constant, not B
  * expressions), i.e. broadcast-by-construction. Weights are integer
  * MICRO-UNITS so the per-document sum is exact and order-free — the same
  * determinism discipline as the sketch family (no float accumulation in
  * a hash-gated path).
  *
  * A real deployment loads trained micro-weights and passes them to
  * [[scoreMicros]]; the plan is identical. For the oracle-gated query the
  * weights come from [[pinnedWeights]] — a pinned pseudo-random
  * projection whose generation FORMULA replays in DuckDB, so the gate
  * verifies the whole inference path (tokenization, bucketing, gather,
  * sum, threshold) without needing a model artifact in two engines.
  */
object QualityModel {

  /** Deterministic stand-in weight vector: weight(b) =
    * ((b·2654435761 + seed) mod 1999) − 999 micro-units, range
    * [−999, 999]. Knuth's multiplicative constant scrambles bucket order;
    * the mod-1999 lattice gives a roughly balanced sign mix. */
  def pinnedWeights(buckets: Int, seed: Long): Array[Long] =
    Array.tabulate(buckets)(b => ((b.toLong * 2654435761L + seed) % 1999L) - 999L)

  /** Integer-micro classifier score of `text`: Σ_tokens
    * weights(portable_hash(token) mod B) + bias. Empty/blank text scores
    * exactly `biasMicros` (the empty-product convention a filter needs:
    * such rows are decided by the bias sign alone). */
  def scoreMicros(text: Column, weights: Array[Long], biasMicros: Long): Column = {
    val b = weights.length
    require(b > 0, "weight vector must be non-empty")
    val w = typedLit(weights.toSeq) // ONE ArrayData literal, broadcast-by-construction
    val hs = SketchFunctions.portableHash64(TextAnalysis.tokens(text))
    aggregate(hs, lit(biasMicros),
      (acc, h) => acc + element_at(w, (pmod(h, lit(b.toLong)) + 1L).cast("int")))
  }

  /** Score every document and attach the keep decision:
    * `(id, n_tokens, score_micros, keep)` where keep ⇔ score ≥
    * `thresholdMicros`. One scan, zero shuffle — the caller chains
    * `.filter(col("keep"))` for the curation pass itself. */
  def scored(
      docs: DataFrame, textCol: String, idCol: String,
      weights: Array[Long], biasMicros: Long, thresholdMicros: Long): DataFrame =
    docs.select(
      col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      scoreMicros(col(textCol), weights, biasMicros).as("score_micros"))
      .withColumn("keep", col("score_micros") >= lit(thresholdMicros))
}
