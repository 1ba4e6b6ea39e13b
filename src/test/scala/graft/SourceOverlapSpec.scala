package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SourceOverlap, StopwordDrift}

class SourceOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redundancy matrix hand frame: directional containment, type (not token) counting, short docs") {
    // a: grams {x y z, y z x} (the repeated doc adds no TYPE)
    // b: grams {x y z, q r s} -> half of b is already in a
    // c: 2 tokens -> no 3-grams, absent from the matrix entirely
    val df = Seq(
      ("a", "x y z x"),   // grams: "x y z", "y z x"
      ("a", "x y z x"),   // exact dup doc: same TYPES
      ("b", "x y z"),     // gram: "x y z" (shared with a)
      ("b", "q r s"),     // gram: "q r s" (unique to b)
      ("c", "x y"))       // too short for a 3-gram
      .toDF("source", "text")
    val got = SourceOverlap.redundancyMatrix(df, "source", "text", n = 3)
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        ((r.getAs[Long]("grams_b"), r.getAs[Long]("shared"),
          r.getAs[Long]("containment_pm")))).toMap
    // a contains half of b's 2 types; b contains 1 of a's 2 types
    assert(got(("a", "b")) == ((2L, 1L, 5000L)))
    assert(got(("b", "a")) == ((2L, 1L, 5000L)))
    // sparse: c shares nothing and has no grams -> no rows either way
    assert(got.size == 2)
  }

  test("redundancy matrix is directional on asymmetric corpora") {
    // b is a subset of a: containment(a ⊇ b) = 10000, reverse is partial
    val df = Seq(
      ("a", "p q r s t"),  // grams: pqr, qrs, rst
      ("b", "p q r"))      // gram:  pqr
      .toDF("source", "text")
    val got = SourceOverlap.redundancyMatrix(df, "source", "text", n = 3)
      .collect().map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Long]("containment_pm")).toMap
    assert(got(("a", "b")) == 10000L) // all of b is in a
    assert(got(("b", "a")) == 3333L)  // 1 of a's 3 types, truncated
  }

  test("redundancy matrix raises loudly past the source-domain bound") {
    val df = (0 until 5).map(i => (s"s$i", "x y z")).toDF("source", "text")
    val e = intercept[IllegalArgumentException] {
      SourceOverlap.redundancyMatrix(df, "source", "text", n = 3,
        maxSources = 4)
    }
    assert(e.getMessage.contains("exceeds the 4"))
  }

  test("stopword drift hand frame: TV permyriad with absent-word mass, headline word") {
    // vocab {the, of}; corpus: the=3, of=1, T=4
    // s1: the=2, of=0 (s=2): present |2*4 - 3*2| = 2; absent of: 2*1 = 2
    //     TV = (2+2)/(2*2*4) = 4/16 -> 2500 pm; headline: 'the' (d=2 > absent-ineligible 'of')
    // s2: the=1, of=1 (s=2): the |1*4-3*2|=2, of |1*4-1*2|=2
    //     TV = 4/16 -> 2500 pm; headline tie d=2/d=2 -> lexicographically larger 'the'
    val df = Seq(
      ("s1", "the the x"),
      ("s2", "the of y"))
      .toDF("source", "text")
    val got = StopwordDrift.profileDrift(df, "source", "text",
        Seq("the", "of"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("sw_tokens"), r.getAs[Long]("tv_pm"),
          r.getAs[String]("top_drift_word")))).toMap
    assert(got("s1") == ((2L, 2500L, "the")))
    assert(got("s2") == ((2L, 2500L, "the")))
  }

  test("stopword drift cells + finish equal the batch path (the census/finish twin contract)") {
    val df = Seq(
      ("s1", "the the of x"),
      ("s2", "the of of y z the"))
      .toDF("source", "text")
    val vocab = Seq("the", "of")
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => r.getAs[String]("source") -> r.toSeq.tail).toMap
    val viaCells = canon(StopwordDrift.driftFromCells(
      StopwordDrift.driftCells(df, "source", "text", vocab), "source"))
    val batch = canon(StopwordDrift.profileDrift(df, "source", "text", vocab))
    assert(viaCells == batch && batch.nonEmpty)
  }

  test("stopword drift: a profile matching the corpus reads zero; no-hit sources are absent") {
    val df = Seq(
      ("s1", "the of the of"),
      ("s2", "the of the of"),
      ("s3", "no vocab hits here"))
      .toDF("source", "text")
    val got = StopwordDrift.profileDrift(df, "source", "text",
        Seq("the", "of"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("tv_pm"))
      .toMap
    assert(got == Map("s1" -> 0L, "s2" -> 0L))
  }
}
