package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.plans.SketchFunctions

/** Cross-document duplicated-SPAN coverage — the span-granular sibling of
  * the document-level dedup family (exact: NearDup.exactDedup; near:
  * minhash/simhash; intra-doc repetition: plans.RepetitionStats). This is
  * the distributed approximation of the suffix-array "exact substring"
  * dedup of Lee et al., "Deduplicating Training Data Makes Language
  * Models Better" (2022): instead of a monolithic suffix array (which
  * does not shard), every word n-gram is hashed positionally, a gram that
  * occurs in ≥2 DISTINCT documents marks its n-token window as
  * cross-document duplicated, and per document the marked windows are
  * merged into maximal islands whose total length is the duplicated-span
  * coverage. Adjacent/overlapping shared grams chain into one island, so
  * a copied paragraph of length L counts L tokens of coverage (the
  * suffix-array answer), not (L−n+1)·n.
  *
  * Why per-doc coverage rather than span removal: training pipelines act
  * on this signal either way (drop doc / trim spans / deprioritize), and
  * the coverage statistic is the decision input common to all three.
  *
  * Scale shape (100 TB):
  *   - the gram stream is O(total tokens) of fixed-width (doc, pos, gh)
  *     rows — no text leaves the tokenize stage;
  *   - duplicated-gram discovery is distinct(gh, doc) → count ≥ 2: both
  *     stages map-side combine on the gram hash, so the shuffle carries
  *     near-distinct grams, not occurrences;
  *   - occurrences re-join the duplicated set as LEFT SEMI on gh — row
  *     multiplication is impossible by construction, even for a
  *     boilerplate gram shared by millions of documents;
  *   - island merge is one doc-key window over the (bounded) flagged
  *     positions — the only per-document state is the running max end.
  */
object SpanDedup {

  /** Per-document coverage by word n-gram spans shared with ≥2 documents.
    *
    * Output: (doc_id, n_tokens, n_dup_grams, covered_tokens, covered_pml)
    * — all BIGINT, totally ordered by doc_id; covered_pml is integer
    * per-mille (covered·1000 DIV n_tokens), exact in any engine.
    */
  def dupSpanCoverage(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8
  ): DataFrame = {
    require(n >= 2, s"span gram width must be >= 2, got $n")
    val grams = gramStream(docs, textCol, idCol, n)
    // grams present in >= 2 distinct docs; both stages combine map-side
    val dup = grams.select("gh", "doc_id").distinct()
      .groupBy("gh").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select("gh")
    coverageAgainst(docs, textCol, idCol, n, grams.join(dup, Seq("gh"), "left_semi"))
  }

  /** INCREMENTAL variant — the batch-arrival shape (the span-granular
    * sibling of the fingerprint incremental dedup): score each BATCH
    * document's coverage by spans already present in the ACCUMULATED
    * CORPUS. The corpus contributes only its distinct gram-hash set
    * (positions and text never leave its tokenize stage), so the
    * standing state a pipeline carries between batches is exactly one
    * hash set — the same state a Bloom/anti-join fingerprint pass keeps,
    * one level finer. Batch-internal duplication deliberately does NOT
    * count (dupSpanCoverage on the batch answers that); a gram marks a
    * batch window only if the CORPUS has it. */
  def incrementalSpanCoverage(
      batch: DataFrame,
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8
  ): DataFrame = {
    require(n >= 2, s"span gram width must be >= 2, got $n")
    val corpusGrams = gramStream(corpus, textCol, idCol, n)
      .select("gh").distinct() // map-side combined; the only standing state
    val batchGrams = gramStream(batch, textCol, idCol, n)
    coverageAgainst(batch, textCol, idCol, n,
      batchGrams.join(corpusGrams, Seq("gh"), "left_semi"))
  }

  /** (doc_id, pos, gh) stream — fixed-width rows, text stays in the
    * tokenize stage. */
  private def gramStream(
      docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    docs.select(
        col(idCol).as("doc_id"),
        SketchFunctions.portableNgramHashes(
          TextAnalysis.tokens(col(textCol)), n).as("ghs"))
      .select(col("doc_id"), posexplode(col("ghs")).as(Seq("pos", "gh")))

  /** Island-merge + per-doc report over a flagged-occurrence frame. */
  private def coverageAgainst(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      occ: DataFrame
  ): DataFrame = {
    val base = docs.select(
      col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    // merge [pos, pos+n) windows into maximal islands per doc
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runMaxPrev: Column = max(col("pos") + lit(n))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = occ
      .withColumn("ni",
        when(col("pos") >= coalesce(runMaxPrev, lit(-1)), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val per = islands.groupBy("doc_id", "island")
      .agg((max(col("pos")) + lit(n) - min(col("pos"))).cast("long").as("c"),
        count(lit(1)).as("nocc"))
      .groupBy("doc_id")
      .agg(sum("c").as("covered_tokens"), sum("nocc").as("n_dup_grams"))
    base.select("doc_id", "n_tokens")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("covered_pml",
        when(col("n_tokens") > 0,
          expr("covered_tokens * 1000 DIV n_tokens")).otherwise(0L))
  }
}
