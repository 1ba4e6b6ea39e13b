package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lexical

class LexicalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(rows: Seq[(String, String)], topK: Int = 10) =
    Lexical.sourceLexicalStats(rows.toDF("source", "text"), "text", "source", topK)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_hapax"), r.getAs[Long]("topk_pmyriad"))))
      .toMap

  test("counts, types, hapax and head coverage are exact") {
    // source a: tokens = the×3, cat×2, sat×1 -> 6 tokens, 3 types, 1 hapax
    // top-1 coverage = 3/6 = 5000 per-myriad
    val got = stats(Seq(
      ("a", "the the cat"),
      ("a", "THE cat sat"),
      ("b", "x y")
    ), topK = 1)
    assert(got("a") == ((6L, 3L, 1L, 5000L)))
    assert(got("b") == ((2L, 2L, 2L, 5000L))) // tie on tf=1 -> 'x' by token asc
  }

  test("topK beyond the vocabulary covers everything; empty sources are absent") {
    val got = stats(Seq(("a", "u v w"), ("empty", "   ")), topK = 10)
    assert(got("a") == ((3L, 3L, 3L, 10000L)))
    assert(!got.contains("empty"))
  }

  test("bpePairCounts: freq-weighted pair counts, rank order, short words skipped") {
    import spark.implicits._
    // "abab" x2 occurrences -> pairs ab,ba,ab each x2: ab=4, ba=2
    // "ab" x1 -> ab+1 = 5; "x" contributes nothing (length 1)
    val docs = Seq("abab ab x", "abab").toDF("text")
    val got = Lexical.bpePairCounts(docs, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(("ab", 5L, 1), ("ba", 2L, 2)))
    // determinism under repartitioning
    val re = Lexical.bpePairCounts(docs.repartition(4), "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(re.toSeq == got.toSeq)
    intercept[IllegalArgumentException](Lexical.bpePairCounts(docs, "text", 0))
  }
}
