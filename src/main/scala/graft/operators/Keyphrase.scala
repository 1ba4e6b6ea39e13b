package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus keyphrase mining: PMI-style bigram collocations and RAKE
  * keyword extraction — the two classic "what phrases matter in this
  * corpus" operators a curation pipeline runs after language ID and
  * before vocabulary decisions.
  *
  * All scoring is truncating integer fixed point (micros) so a SQL
  * oracle replays it exactly; ranking ties are broken lexically, making
  * top-k deterministic in both engines.
  *
  * SCALE SHAPE: both operators are explode → groupBy — one shuffle on
  * the token/bigram/phrase key, map-side combined. Bigrams are built in
  * the ARRAY domain (transform over the token list), not via a lag
  * window, so the token stream is never shuffled by document; the
  * vocabulary frames that join back are vocab-sized (auto-broadcast).
  */
object Keyphrase {

  /** Bigram collocations by truncating lift:
    *   t1 = (1e6 * c_xy) DIV c_x;  lift_micro = (t1 * n_tok) DIV c_y
    * (two bounded steps — t1 <= 1e6 since c_xy <= c_x, so the second
    * product fits a long at any corpus size that fits a cluster).
    * Pairs below `minPair` are noise-filtered before the join. */
  def pmiCollocations(docs: DataFrame, textCol: String, minPair: Long,
                      topK: Int): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
    val cx = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(count(lit(1)).as("ntok"))
    val bi = toks.select(explode(expr(
        """transform(slice(tk, 1, greatest(size(tk) - 1, 0)),
          |  (x, i) -> struct(x AS w1, element_at(tk, i + 2) AS w2))"""
          .stripMargin.replace("\n", " "))).as("u"))
      .select(col("u.w1").as("w1"), col("u.w2").as("w2"))
    bi.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPair)
      .join(cx.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(cx.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(tot)
      .select(col("w1"), col("w2"), col("n_pair"), col("c1"), col("c2"),
        expr("(((1000000 * n_pair) DIV c1) * ntok) DIV c2").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** TEXTRANK — graph-based keyword ranking: build the word
    * co-occurrence graph (adjacent non-stopword tokens, undirected,
    * weight = co-occurrence count, edges below `minCooc` pruned as
    * noise) and rank words by integer-exact PageRank over it
    * ([[Graph.pageRank]] — micro-unit ranks, order-free integer sums,
    * bit-identical on any engine). The classic unsupervised "which
    * words organize this corpus" extractor; where RAKE scores words by
    * local phrase statistics, TextRank scores them by global graph
    * centrality — hub words win even when individually rare.
    *
    * Scale shape: the corpus collapses to a vocab-sized edge list in
    * one explode → groupBy shuffle; the PageRank loop then runs on
    * THAT graph (vocab² worst case, far smaller in practice), never
    * touching documents again. Symmetrization doubles the edge list so
    * the undirected random walk is exact. */
  def textRank(docs: DataFrame, textCol: String, stopwords: Seq[String],
               minCooc: Long, iterations: Int, topK: Int): DataFrame = {
    val stops = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
    val base = docs.select(TextAnalysis.tokens(col(textCol)).as("tk"))
      .select(expr(s"filter(tk, x -> x NOT IN $stops)").as("tk"))
    val bi = base.select(explode(expr(
        """transform(slice(tk, 1, greatest(size(tk) - 1, 0)),
          |  (x, i) -> struct(x AS w1, element_at(tk, i + 2) AS w2))"""
          .stripMargin.replace("\n", " "))).as("u"))
      .filter(col("u.w1") =!= col("u.w2"))
      .select(least(col("u.w1"), col("u.w2")).as("a"),
        greatest(col("u.w1"), col("u.w2")).as("b"))
    val und = bi.groupBy("a", "b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minCooc)
    val edges = und.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst"), col("w")))
    Graph.pageRank(edges, "src", "dst", "w", iterations)
      .select(col("node").as("word"), col("pr_micros"))
      .orderBy(col("pr_micros").desc, col("word").asc)
      .limit(topK)
  }

  /** RAKE: split each document's token stream into candidate phrases at
    * stopword boundaries; word score = (1e6 * degree) DIV freq where
    * degree sums the lengths of phrases containing the word; phrase
    * score = sum of member word scores (repeated members count each
    * occurrence). Phrases longer than `maxLen` are discarded (RAKE's
    * run-on guard). Returns the `topK` phrases by (score desc, phrase). */
  def rakeKeyphrases(docs: DataFrame, idCol: String, textCol: String,
                     stopwords: Seq[String], maxLen: Int,
                     topK: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc").orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stops = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
    val words = docs
      .select(col(idCol).as("doc"), posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
      .withColumn("st", expr(s"CASE WHEN w IN $stops THEN 1L ELSE 0L END"))
      .withColumn("pid", sum(col("st")).over(byDoc))
      .filter(col("st") === 0)
      .select("doc", "pid", "pos", "w")
    val plen = words.groupBy("doc", "pid").agg(count(lit(1)).as("plen"))
    val wscore = words.join(plen, Seq("doc", "pid"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .select(col("w"), expr("(1000000 * degree) DIV freq").as("ws"))
    val phrases = words.groupBy("doc", "pid")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(pos, w))), p -> p.w), ' ')")
        .as("phrase"), count(lit(1)).as("plen"))
      .filter(col("plen") <= maxLen)
      .groupBy("phrase", "plen")
      .agg(count(lit(1)).as("phrase_freq"))
    phrases
      .select(col("phrase"), col("plen"), col("phrase_freq"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wscore, "w")
      .groupBy("phrase", "plen", "phrase_freq")
      .agg(sum(col("ws")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase").asc)
      .limit(topK)
  }
}
