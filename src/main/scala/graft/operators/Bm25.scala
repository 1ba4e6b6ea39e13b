package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Okapi BM25 ranking for a literal term set — the lexical-retrieval
  * scorer (Robertson & Zaragoza 2009) a curation pipeline uses to pull
  * topic-relevant documents out of a web-scale corpus.
  *
  *   score(d) = Σ_t idf_t · tf · (k1+1) / (tf + k1·(1−b) + k1·b·dl/avgdl)
  *   idf_t    = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)       (Lucene form)
  *
  * Shape, chosen for the scan-not-shuffle profile:
  *  - per-term tf and dl are `size(filter(tokens, …))` projections — ONE
  *    tokenize scan, no explode, no (doc, token) shuffle at all (the term
  *    set is tiny and literal, unlike q49's full TF-IDF);
  *  - the narrow (doc_id, dl, tf…) table is checkpointed; N, avgdl and
  *    per-term df come off it in one aggregate row (driver-side scalars,
  *    bounded: 2 + |terms| numbers);
  *  - only matching docs (Σtf > 0) are ranked — top-k never touches the
  *    non-matching corpus.
  *
  * Determinism: every data-dependent quantity is integer or a correctly-
  * rounded double of integers; the one transcendental (idf's ln) can
  * differ by an ulp across engines, so the EXPOSED score is quantized to
  * integer micro-units (floor(x·1e6 + 0.5)) and ranking orders by the
  * quantized score — the q49/q70 quantize-before-rank construction,
  * boundary-flip caveat included.
  */
object Bm25 {

  /** ONE scoring/ranking tail shared by the scan path and the stored-
    * index path — given the (doc_id, dl, tf_<t>…) frame and the corpus
    * scalars, the two paths cannot diverge on the formula. */
  private def rankTopK(
      base: DataFrame,
      terms: Seq[String],
      n: Long,
      avgdl: Double,
      dfs: Map[String, Long],
      k: Int,
      k1: Double,
      b: Double
  ): DataFrame = {
    val score: Column = terms.map { t =>
      val dfT = dfs(t)
      val idf = math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
      val tf = col(s"tf_$t").cast("double")
      (lit(idf) * (tf * lit(k1 + 1.0))) /
        (tf + lit(k1 * (1 - b)) + lit(k1 * b) * (col("dl").cast("double") / lit(avgdl)))
    }.reduceLeft(_ + _)
    // top-k via orderBy+limit (TakeOrdered: k rows per partition to the
    // driver, no global-window shuffle of the whole matched set), THEN
    // rank the k survivors — the window sees k rows only
    val w = Window.orderBy(col("score_micros").desc, col("doc_id").asc)
    base
      .filter(terms.map(t => col(s"tf_$t")).reduceLeft(_ + _) > 0)
      .withColumn("score_micros", floor(score * lit(1e6) + lit(0.5)).cast("long"))
      .orderBy(col("score_micros").desc, col("doc_id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(w))
  }

  /** Top-k docs by BM25 over literal `terms`. Output: doc_id, dl, one
    * `tf_<term>` column per term, score_micros, rank. */
  def scoreTopK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "terms must be a small literal set")
    val tfCols = terms.map(t =>
      size(filter(col("__t"), x => x === lit(t))).cast("long").as(s"tf_$t"))
    val base = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(Seq(col("doc_id"), size(col("__t")).cast("long").as("dl")) ++ tfCols: _*)
      .localCheckpoint(true) // narrow ints; tokenize runs once, stats + scoring share it
    val statCols = Seq(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl")) ++
      terms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t"))
    val statRow = base.agg(statCols.head, statCols.tail: _*).head()
    val n = statRow.getAs[Long]("n")
    val avgdl = statRow.getAs[Long]("sum_dl").toDouble / n
    val dfs = terms.map(t => t -> statRow.getAs[Long](s"df_$t")).toMap
    rankTopK(base, terms, n, avgdl, dfs, k, k1, b)
  }

  /** FULL INVERTED INDEX build — the stored-retrieval twin of the
    * materialized ANN index: `postings(term, doc_id, tf)` over EVERY
    * term (the classic one-explode one-(term,doc)-shuffle index build,
    * map-side combined) and `docstats(doc_id, dl)`. Persist both (e.g.
    * through [[graft.sink.SnapshotSink]]) and serve queries with
    * [[scoreTopKFromIndex]] — document text is tokenized once at build
    * time, never at query time. */
  def buildIndex(docs: DataFrame, textCol: String, idCol: String): (DataFrame, DataFrame) = {
    val toks = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("__t"))
      .localCheckpoint(true) // tokenize once; postings + docstats share it
    val postings = toks
      .select(col("doc_id"), explode(col("__t")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val docstats = toks.select(col("doc_id"), size(col("__t")).cast("long").as("dl"))
    (postings, docstats)
  }

  /** BM25 top-k served FROM THE STORED INDEX — no document text
    * anywhere in this plan: per-doc tfs come from the query terms'
    * posting rows (the term filter pushes down to the postings scan, so
    * only the queried slivers of the index are read), dl/N/avgdl from
    * docstats, df from a |terms|-bounded aggregate. Produces exactly
    * [[scoreTopK]]'s output — same integers, same doubles, same
    * quantize-then-rank — which is what lets the stored-index query
    * (q142) share the from-scratch oracle. */
  def scoreTopKFromIndex(
      postings: DataFrame,
      docstats: DataFrame,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "terms must be a small literal set")
    val statRow = docstats.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl")).head()
    val n = statRow.getAs[Long]("n")
    val avgdl = statRow.getAs[Long]("sum_dl").toDouble / n
    val hits = postings.filter(col("term").isin(terms: _*)).localCheckpoint(true)
    val dfs: Map[String, Long] = {
      val got = hits.groupBy("term").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      terms.map(t => t -> got.getOrElse(t, 0L)).toMap
    }
    val tfAggs = terms.map(t =>
      sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"tf_$t"))
    val base = hits.groupBy("doc_id").agg(tfAggs.head, tfAggs.tail: _*)
      .join(docstats, Seq("doc_id"))
      // honor scoreTopK's column order exactly (positional consumers)
      .select(Seq(col("doc_id"), col("dl")) ++ terms.map(t => col(s"tf_$t")): _*)
    rankTopK(base, terms, n, avgdl, dfs, k, k1, b)
  }
}
