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

  private def kn(docs: Seq[String]) =
    NgramLm.knContinuation(
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "text")
      .collect().map(r => r.getAs[String]("token") ->
        (r.getAs[Long]("c_uni"), r.getAs[Long]("cont_left"),
          r.getAs[Long]("fanout_right"), r.getAs[Long]("discount_pm")))
      .toMap

  test("knContinuation: the San-Francisco case — frequent but stuck") {
    // 'francisco' appears 3x, always after 'san'; 'york' appears 3x
    // after three DIFFERENT left contexts — same raw count, different
    // continuation count, which is the whole point of KN
    val out = kn(Seq(
      "san francisco fog", "san francisco bay", "san francisco hills",
      "new york", "old york", "em york"))
    assert(out("francisco")._1 == 3L && out("york")._1 == 3L)
    assert(out("francisco")._2 == 1L)
    assert(out("york")._2 == 3L)
  }

  test("knContinuation: fan-out, boundaries, and singleton tokens") {
    val out = kn(Seq("a b", "a c", "a d", "z"))
    assert(out("a")._3 == 3L)           // a -> {b,c,d}
    assert(out("a")._2 == 0L)           // nothing precedes a
    // bigrams never cross documents: 'b a' would need doc1->doc2
    assert(out("b")._3 == 0L)
    // 'z' has no bigrams at all but still appears in the census
    assert(out("z") == ((1L, 0L, 0L, out("z")._4)))
  }

  test("knContinuation: Ney discount from n1/n2") {
    // bigrams: (a b) x1, (c d) x2 -> n1=1, n2=1, D = 1/(1+2) = 3333pm
    val out = kn(Seq("a b", "c d", "c d"))
    assert(out("a")._4 == 3333L)
  }

  test("knContinuation: no singleton/doubleton evidence -> NULL discount, not 0") {
    val rows = NgramLm.knContinuation(
        Seq((1L, "a b"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text"),
        "text").collect()
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("discount_pm"))))
  }
}
