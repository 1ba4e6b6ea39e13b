package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.NgramLm

class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigram LM separates common sequences from novel ones") {
    // 20 copies of the same sentence + one novel-word doc: the common
    // phrase's bigrams are high-probability, the novel doc's are floor
    val common = (1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val novel = Seq((100L, "zyx wvu tsr qpo nml kji hgf edc bab"))
    val scored = NgramLm.scoreDocs((common ++ novel).toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(scored(1L)._1 == 8) // 9 tokens -> 8 bigrams
    assert(scored(100L)._2 > scored(1L)._2 + 1.0,
      s"novel doc must be clearly more surprising: ${scored(100L)._2} vs ${scored(1L)._2}")
    // identical docs score identically
    assert(scored(1L) == scored(2L))
    // docs with < 2 tokens are absent (no bigrams to score)
    val short = NgramLm.scoreDocs(
      (common :+ ((200L, "solo"))).toDF("doc_id", "text"), "text", "doc_id")
    assert(short.filter($"doc_id" === 200L).isEmpty)
  }

  test("oovTwin: same token count, disjoint vocabulary, deterministic") {
    val docs = Seq((7L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val twin = docs.select(NgramLm.oovTwin("text", "doc_id").as("t"))
      .head().getString(0)
    assert(twin == "oov7x0 oov7x1 oov7x2 oov7x3")
    val again = docs.select(NgramLm.oovTwin("text", "doc_id").as("t"))
      .head().getString(0)
    assert(twin == again)
  }
}
