package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Per-source LEXICAL profile — the vocabulary-shape readout a data
  * curator watches next to [[Drift]]: token volume, type (distinct-token)
  * count, hapax-legomena count (tokens occurring once — the noise/OCR
  * tail), and Zipf HEAD coverage (the fraction of all token instances
  * claimed by the top-K types, reported in integer per-myriad so the
  * statistic is cross-engine exact). Template spam shows up as head
  * coverage spiking; scraper breakage or language shift shows up in the
  * hapax tail; both move before aggregate quality scores do.
  *
  * Scale shape: one tokenize scan into a map-side-combined
  * (source, token) count table — the same first shuffle every vocab
  * operator here pays, vocab-sized output; the per-source aggregates and
  * the top-K window both run over that table (the window partitions by
  * source over vocab-sized input, never over the token stream). All
  * outputs are exact integers: per-myriad coverage is an integer `div`,
  * so no float ever enters the result.
  */
object Lexical {

  /** `(source, n_tokens, n_types, n_hapax, topk_pmyriad)` per source.
    * Sources with zero tokens have no count rows and are absent. */
  def sourceLexicalStats(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      topK: Int = 10
  ): DataFrame = {
    require(topK > 0)
    val counts = df.select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // two consumers: aggregates + top-K window
    val agg = counts.groupBy("source").agg(
      sum(col("tf")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
    val byTf = Window.partitionBy("source").orderBy(col("tf").desc, col("token").asc)
    val top = counts.withColumn("rk", row_number().over(byTf))
      .filter(col("rk") <= topK)
      .groupBy("source").agg(sum(col("tf")).as("top_tf"))
    agg.join(top, Seq("source"), "left")
      // integer div keeps the statistic exact (n_tokens > 0 by construction)
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("(coalesce(top_tf, 0L) * 10000) div n_tokens").as("topk_pmyriad"))
  }

  /** BPE MERGE-CANDIDATE counting — the first iteration of byte-pair-
    * encoding tokenizer training: count every adjacent character pair
    * across all token OCCURRENCES and rank the top merge candidates
    * (`(pair, n_occurrences, merge_rank)`). This is the statistic a BPE
    * trainer maximizes at each merge step; running it over a corpus
    * slice answers "what would this corpus's tokenizer merge first" and
    * flags vocabulary drift between corpora long before downstream
    * token-count shifts do.
    *
    * Scale shape — the trainer's own trick: aggregate the token stream
    * to (distinct word, freq) FIRST (the one corpus-sized shuffle, the
    * q37 vocab shape), then explode pairs over the vocab-sized table
    * weighted by freq — pair counting never touches the token stream
    * again, so each merge iteration after the first is vocab-sized work.
    * Pure integer counts; the rank window orders (n desc, pair asc)
    * over ≤ alphabet² rows. */
  def bpePairCounts(
      df: DataFrame,
      textCol: String,
      topK: Int = 30
  ): DataFrame = {
    require(topK > 0)
    val words = df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val pairs = words.filter(length(col("w")) >= 2)
      .select(col("freq"), explode(
        expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("n_occurrences"))
    val byN = Window.orderBy(col("n_occurrences").desc, col("pair").asc)
    pairs.withColumn("merge_rank", row_number().over(byN))
      .filter(col("merge_rank") <= topK)
  }
}
