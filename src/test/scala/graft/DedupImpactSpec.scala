package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

class DedupImpactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dedup impact: cross-source duplicates die in the later source") {
    // doc 1 (src a) and doc 5 (src b) are identical after
    // canonicalization; min doc_id wins, so b loses it
    val docs = Seq(
      (1L, "a", "the quick fox"),
      (2L, "a", "something else"),
      (5L, "b", "  The   QUICK fox "),
      (6L, "b", "unique b text here")).toDF("doc_id", "source", "text")
    val out = Profile.dedupImpact(docs, "text", "doc_id", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = out("a"); val b = out("b")
    assert(a.getAs[Long]("n_docs") == 2L && a.getAs[Long]("surv_docs") == 2L)
    assert(a.getAs[Long]("doc_keep_pm") == 10000L)
    assert(b.getAs[Long]("n_docs") == 2L && b.getAs[Long]("surv_docs") == 1L)
    assert(b.getAs[Long]("doc_keep_pm") == 5000L)
    // token accounting: b's raw 3+4=7 tokens, surviving 4
    assert(b.getAs[Long]("n_toks") == 7L)
    assert(b.getAs[Long]("surv_toks") == 4L)
    assert(b.getAs[Long]("tok_keep_pm") == (10000L * 4) / 7)
  }

  test("dedup impact: a source can lose everything and still report") {
    val docs = Seq(
      (1L, "a", "same text"), (9L, "b", "same text"))
      .toDF("doc_id", "source", "text")
    val out = Profile.dedupImpact(docs, "text", "doc_id", "source")
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("b").getAs[Long]("surv_docs") == 0L)
    assert(out("b").getAs[Long]("doc_keep_pm") == 0L)
    assert(out("a").getAs[Long]("doc_keep_pm") == 10000L)
  }
}
