package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark join join join filter"),   // heavy on 'join'
    (1L, "spark join filter scan"),        // one of each
    (2L, "filter scan scan merge merge"),  // no 'join'
    (3L, "spark spark spark spark spark spark spark spark spark join"), // long doc, one 'join'
    (4L, "merge merge merge")              // matches nothing
  ).toDF("doc_id", "text")

  test("bm25: tf saturation and length normalization order as expected") {
    val r = Bm25.scoreTopK(docs, "text", "doc_id", Seq("join", "scan"), k = 10)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("score_micros")).toMap
    assert(!r.contains(4L), "doc matching no term must not be ranked")
    assert(r(1L) > r(0L),
      "rarer 'scan' (higher idf) + 'join' must outscore saturating repeats of 'join' alone")
    assert(r.contains(2L), "scan-only doc still matches")
    // length normalization: doc 3 (dl=10, one join) scores below doc 1 (dl=4, one join + one scan)
    assert(r(1L) > r(3L))
  }

  test("bm25: rank is dense 1..k ordered by quantized score desc then id") {
    val rows = Bm25.scoreTopK(docs, "text", "doc_id", Seq("join"), k = 3).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    val scores = rows.map(_.getAs[Long]("score_micros"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("bm25: absent term contributes nothing and breaks nothing") {
    val r = Bm25.scoreTopK(docs, "text", "doc_id", Seq("join", "zzz_absent"), k = 10)
      .collect()
    val only = Bm25.scoreTopK(docs, "text", "doc_id", Seq("join"), k = 10).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSet == only.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("stored-index serve equals the scan path, integer for integer (absent term included)") {
    val terms = Seq("join", "vector", "zzz_absent")
    val (postings, docstats) = Bm25.buildIndex(docs, "text", "doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dl"),
        r.getAs[Long]("tf_join"), r.getAs[Long]("tf_vector"),
        r.getAs[Long]("score_micros"), r.getAs[Int]("rank"))).toSeq
    val served = rows(Bm25.scoreTopKFromIndex(postings, docstats, terms, k = 10))
    val scanned = rows(Bm25.scoreTopK(docs, "text", "doc_id", terms, k = 10))
    assert(served == scanned && served.nonEmpty)
  }
}
