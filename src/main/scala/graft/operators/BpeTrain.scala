package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** BPE MERGE DISCOVERY — tokenizer vocabulary induction over a corpus
  * (Sennrich et al., "Neural Machine Translation of Rare Words with
  * Subword Units", ACL 2016): count adjacent symbol pairs over the word
  * vocabulary weighted by word frequency, repeatedly merge the most
  * frequent pair. The training-data angle: the merge table IS the
  * tokenizer; discovering it from the corpus being curated is how a
  * pipeline bootstraps a vocab (and how it audits an existing vocab's
  * fit — `functions/TextAnalysis.subwordCount` approximates the budget,
  * this learns the actual merges).
  *
  * Scale shape: everything runs on the WORD VOCABULARY with frequencies
  * — one corpus scan collapses 100 TB of text to a vocab-sized
  * (word, freq) table (Heaps' law: ~10⁶–10⁷ rows), and every merge
  * round is a vocab-sized pair count + a vocab-sized symbol-array
  * rewrite. The driver holds only the running merge list (one row per
  * round) and each round's argmax (one row) — the MLlib-style bounded
  * driver state, not data. Pair explosion is bounded by total symbol
  * count ≤ total vocab characters, shrinking every round.
  */
object BpeTrain {

  /** Corpus → (word, freq): the one corpus-sized scan. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1L)).as("freq"))

  /** Split into single-character symbols — the BPE round-0 state.
    * `(?!^)` splits between every pair of adjacent chars; Spark's split
    * keeps the trailing empty the end-of-string lookahead produces, so
    * it is filtered — leaving the same char list DuckDB's empty-pattern
    * regexp split yields, so round-1 counts replay cross-engine. */
  def charSymbols(word: Column): Column =
    filter(split(word, "(?!^)"), t => t =!= lit(""))

  /** Adjacent-pair frequencies over a symbolized vocab
    * (`symbols: array<string>`, `freq`): Σ freq per (a, b) pair,
    * overlapping occurrences counted per position (the BPE convention
    * for counting; merging is greedy leftmost, see [[mergeOnce]]). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("symbols")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(symbols) - 1), " +
          "i -> struct(symbols[i - 1] AS a, symbols[i] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Greedy leftmost application of one merge (a, b) → ab to a symbol
    * array: a fold that joins the pair when the accumulator's last
    * symbol is `a` and the next is `b` — "aaa" under (a,a) becomes
    * [aa, a], the standard convention. */
  def mergeOnce(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, array().cast("array<string>"),
      (acc, x) => when(
        coalesce(try_element_at(acc, lit(-1)) === lit(a) && x === lit(b), lit(false)),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** BOTH-SIDES-DELIMITED string encoding of a symbol array:
    * `␟a␟␟b␟␟c␟` (every symbol wrapped in the separator) — the form in
    * which ONE literal string replace per merge applies BPE greedily:
    * searching `␟a␟␟b␟` can only match two complete adjacent symbols
    * (both anchors present), never a symbol's substring, and replacing
    * with `␟ab␟` leaves both neighbors' anchors intact so the scan
    * continues into the next candidate pair — exactly [[mergeOnce]]'s
    * greedy-leftmost fold (spec-proven equivalent), but expressible in
    * any engine with a string replace, which is what makes the q150
    * two-engine learning replay possible. `sep` must not occur in any
    * symbol (default U+0001; corpus tokens are whitespace-split so
    * control chars cannot survive tokenization). */
  def encodeSymbols(symbols: Column, sep: String = "\u0001"): Column =
    concat(lit(sep), array_join(symbols, sep + sep), lit(sep))

  /** One merge (a, b) → ab applied to an [[encodeSymbols]] string. */
  def applyMerge(enc: Column, a: String, b: String, sep: String = "\u0001"): Column =
    call_function("replace", enc,
      lit(sep + a + sep + sep + b + sep), lit(sep + a + b + sep))

  /** Human-readable `a|b|c` piece list of an encoded string. */
  def pieces(enc: Column, sep: String = "\u0001"): Column =
    call_function("replace",
      call_function("replace", enc, lit(sep + sep), lit("|")),
      lit(sep), lit(""))

  /** Piece count of an encoded string: each symbol carries exactly two
    * separator chars, so count(sep) / 2 — pure length arithmetic, no
    * split. */
  def pieceCount(enc: Column, sep: String = "\u0001"): Column =
    ((length(enc) -
      length(call_function("replace", enc, lit(sep), lit("")))) / 2).cast("long")

  /** Learn `rounds` merges from a corpus: symbolize the vocab, then per
    * round count pairs, take the argmax (count desc, then (a, b) asc —
    * deterministic), rewrite the vocab, repeat. Stops early when no
    * pair occurs at least `minCount` times. Returns the merge table in
    * learned order. Each round's vocab is checkpointed so plan depth
    * stays constant across rounds (the q120 PageRank discipline). */
  def learnMerges(
      docs: DataFrame, textCol: String, rounds: Int,
      minCount: Long = 2L): Seq[(String, String, Long)] = {
    require(rounds >= 1 && rounds <= 64,
      "rounds must be in [1, 64] — each round is a full vocab rewrite")
    var vocab = wordCounts(docs, textCol)
      .select(charSymbols(col("word")).as("symbols"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    var r = 0
    while (r < rounds && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minCount) done = true
      else {
        val (a, b, c) = (top.head.getAs[String]("a"),
          top.head.getAs[String]("b"), top.head.getAs[Long]("cnt"))
        merges += ((a, b, c))
        vocab = vocab.select(mergeOnce(col("symbols"), a, b).as("symbols"),
          col("freq")).localCheckpoint(true)
      }
      r += 1
    }
    merges.toSeq
  }

  /** TOKENIZER FERTILITY by group — the standard cross-lingual
    * tokenizer-equity metric: pieces-per-word (fertility) and
    * chars-per-piece (compression) per group (language, source), under
    * ONE corpus-globally-learned merge table. A tokenizer trained on a
    * skewed mix over-segments the under-represented languages; this
    * readout is where that shows up as a number (fertility_pm spread
    * across langs) before anyone trains on the tokens.
    *
    * Scale shape: merge learning is [[learnMerges]]'s vocab-sized
    * loop; fertility then needs one (group, word) aggregate and a
    * vocab-sized segmentation projection (the same fold q150 runs).
    * All integer counts; ratios one truncating DIV each.
    */
  def fertilityByGroup(docs: DataFrame, textCol: String, groupCol: String,
      rounds: Int = 8, minCount: Long = 1L): DataFrame = {
    val merges = learnMerges(docs, textCol, rounds, minCount)
    val lw = docs.select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("grp", "word").agg(count(lit(1)).as("freq"))
    val enc0 = encodeSymbols(charSymbols(col("word")))
    val encN = merges.foldLeft(enc0) { case (c, (a, b, _)) =>
      applyMerge(c, a, b) }
    lw.select(col("grp"), col("freq"),
        length(col("word")).cast("long").as("nc"),
        pieceCount(encN).as("np"))
      .groupBy("grp")
      .agg(sum(col("freq")).as("n_words"),
        sum(col("freq") * col("np")).as("n_pieces"),
        sum(col("freq") * col("nc")).as("n_chars"))
      .withColumn("fertility_pm", expr("(10000 * n_pieces) DIV n_words"))
      .withColumn("chars_per_piece_pm",
        expr("(10000 * n_chars) DIV n_pieces"))
      .select("grp", "n_words", "n_pieces", "n_chars", "fertility_pm",
        "chars_per_piece_pm")
      .orderBy("grp")
  }
}
