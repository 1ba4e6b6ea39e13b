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

  /** KNESER-NEY CONTINUATION STATISTICS — the count table a KN-smoothed
    * LM is built from, and the diagnostic that separates VERSATILE
    * tokens from FREQUENT-BUT-STUCK ones. Raw unigram counts mislead a
    * backoff model: "Francisco" is frequent but follows almost only
    * "San", so its weight when the bigram context is MISSING should be
    * near zero. KN fixes this by replacing raw counts with continuation
    * counts — per token w:
    *
    *   cont_left    = N1+(·w)  distinct left contexts (the KN unigram
    *                           numerator),
    *   fanout_right = N1+(w·)  distinct continuations (the backoff
    *                           weight λ(w)'s normalizer),
    *   p_cont_ppm   = 10⁶·cont_left / Σ N1+ = 10⁶·cont_left / |bigram
    *                           types| (truncating — the house DIV),
    *
    * plus the corpus-level absolute-discount estimate
    * D = n1/(n1 + 2·n2) (Ney/Essen/Kneser) in truncating permyriad,
    * where n1/n2 are the bigram types seen exactly once/twice.
    *
    * Scale shape: one bigram explode → (w1, w2) count aggregate
    * (map-side combined; output is the observed-bigram TYPE table,
    * vocabulary-bounded and checkpointed — ALL downstream frames derive
    * from types, never re-touching row grain); continuation and fanout
    * are two vocab-sized aggregates of the type table; corpus n1/n2/T
    * ride as a 1-row crossJoin scalar. Bigrams never cross document
    * boundaries. All counts exact integers — hash-identical anywhere. */
  def knContinuation(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs
      .select(TextAnalysis.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 1)
      .localCheckpoint(true) // unigram + bigram passes share one tokenize
    val bi = toks
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(slice(t, 1, size(t) - 1)," +
          " (w, i) -> struct(w AS w1, element_at(t, i + 2) AS w2))"))
        .as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // type table feeds cont, fanout, and corpus
    val uni = toks.select(explode(col("t")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c_uni"))
    val cont = bi.groupBy(col("w2").as("token"))
      .agg(count(lit(1)).as("cont_left"))
    val fan = bi.groupBy(col("w1").as("token"))
      .agg(count(lit(1)).as("fanout_right"))
    val corpus = bi.agg(
        count(lit(1)).as("bigram_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      // a corpus where every bigram repeats 3+ times has no singleton
      // evidence to estimate a discount from — NULL, not a crash (and
      // not 0, which would claim "no discounting needed")
      .withColumn("discount_pm",
        expr("CAST(10000 * n1 DIV nullif(n1 + 2 * n2, 0) AS BIGINT)"))
    uni
      .join(cont, Seq("token"), "left")
      .join(fan, Seq("token"), "left")
      .na.fill(0L, Seq("cont_left", "fanout_right"))
      .crossJoin(corpus)
      .withColumn("p_cont_ppm",
        expr("CAST(1000000 * cont_left DIV nullif(bigram_types, 0) AS BIGINT)"))
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
