package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Count-based bigram language model for PERPLEXITY-style quality
  * filtering — the classic "train a cheap LM on the corpus, drop the
  * documents it finds surprising" signal (gibberish, boilerplate soup,
  * OCR noise), kept fully self-contained: the model IS the corpus bigram
  * table, no external artifacts.
  *
  * Model: Laplace-smoothed conditional bigram probability
  * `P(w2 | w1) = (C(w1 w2) + 1) / (C(w1) + V)` with V = distinct unigram
  * count; document score = mean negative log-probability over its
  * bigrams (avg NLL ≈ log-perplexity). All counts are exact integers.
  *
  * Scale shape: two count aggregations (bigram, unigram — map-side
  * combined, vocab-sized outputs) and two equi-joins attaching counts
  * back to the exploded gram stream (shuffles on gram/word, ids+8-byte
  * counts as payloads; AQE broadcasts the count tables while they fit).
  * At 100 TB the standard trade applies and is the caller's knob: cap
  * the vocabulary (count cutoff) so the count tables stay broadcastable,
  * with unseen grams already handled by the smoothing floor.
  *
  * Cross-engine exactness: a raw float sum of `ln` terms is
  * order-sensitive and libm/Java `ln` differ in the last ulp, so the
  * score is ALSO emitted as integer micro-nats — each gram's NLL
  * quantized with an explicit floor(x·1e6 + 0.5) and summed as exact
  * integers (the same quantize-then-sum construction as
  * [[Drift.tokenDrift]]; its boundary-flip caveat applies equally: a
  * term within an ulp of a quantum boundary is data-dependent, not
  * guaranteed). The double `avg_nll` remains for ranking use; the
  * micro-nat column is the auditable one the q65 oracle replays, with
  * the planted [[oovTwin]] certificate kept as ground truth.
  */
object NgramLm {

  /** Per-document bigram count and NLL under the corpus LM:
    * `(idCol, n_grams, avg_nll, nll_micros)` — `avg_nll` the double mean,
    * `nll_micros` the cross-engine-exact integer micro-nat SUM (divide by
    * `n_grams` for the mean; kept un-divided so it stays an integer).
    * Documents with fewer than 2 tokens carry no bigrams and are absent
    * from the output. */
  def scoreDocs(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // one tokenize pass through the native BigramHashes loop: the
    // exploded (doc, bigram-hash, first-word-hash) stream feeds the count
    // tables AND the scoring join — 8-byte keys, never gram strings, and
    // checkpointed so the three consumers share one materialization
    val grams = docs
      .select(col(idCol).as("id"),
        explode(graft.plans.SketchFunctions.bigramHashes(
          TextAnalysis.tokens(col(textCol)))).as("gw"))
      .select(col("id"), col("gw.g").as("gram"), col("gw.w").as("w1"))
      .localCheckpoint(true)
    val bigramCounts = grams.groupBy("gram").agg(count(lit(1)).as("c2"))
    val unigramCounts = grams.groupBy("w1").agg(count(lit(1)).as("c1"))
    // V = distinct FIRST-position unigram count — consistent with using
    // c1 (first-position occurrences) as the conditional's denominator
    val v = unigramCounts.count()
    grams
      .join(bigramCounts, "gram")
      .join(unigramCounts, "w1")
      .withColumn("nll", -log((col("c2") + 1).cast("double") / (col("c1") + lit(v))))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"), avg(col("nll")).as("avg_nll"),
        sum(floor(col("nll") * lit(1e6) + lit(0.5)).cast("long")).as("nll_micros"))
  }

  /** Deterministic OUT-OF-VOCABULARY twin of a text column: every token
    * replaced by a unique synthetic token derived from (`seedCol`,
    * position) — same length, every bigram novel. The canonical planted
    * ground truth for an LM quality filter: a document made of sequences
    * the corpus has never seen MUST score strictly worse than its
    * natural twin (pure column expressions, reproducible everywhere). */
  def oovTwin(textCol: String, seedCol: String): org.apache.spark.sql.Column =
    concat_ws(" ", transform(TextAnalysis.tokens(col(textCol)),
      (_, i) => concat(lit("oov"), col(seedCol), lit("x"), i)))
}
