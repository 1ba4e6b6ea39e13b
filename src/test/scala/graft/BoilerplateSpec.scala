package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate

class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def strip(rows: Seq[(Long, String, String)], frac: Int = 50) =
    Boilerplate.stripBoilerplate(rows.toDF("doc_id", "source", "text"),
        "text", "doc_id", "source", minFracPct = frac)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_lines"), r.getAs[Int]("n_removed"), r.getAs[String]("clean_text"))))
      .toMap

  test("frequent lines are stripped per source; rare and unique lines survive") {
    val rows = Seq(
      (1L, "a", "promo\nalpha body one\nfooter"),
      (2L, "a", "promo\nbeta body two\nfooter"),
      (3L, "a", "promo\ngamma body three"),
      // 'promo' is frequent in source a but occurs in only one b doc (1/2 = 50%):
      // at frac=60 it survives in b — per-source isolation
      (4L, "b", "promo\ndelta body four"),
      (5L, "b", "epsilon body five")
    )
    val got = strip(rows, frac = 60)
    assert(got(1L) == ((3, 2, "alpha body one")))       // promo + footer (2/3=67%) removed
    assert(got(2L) == ((3, 2, "beta body two")))
    assert(got(3L) == ((2, 1, "gamma body three")))
    assert(got(4L) == ((2, 0, "promo\ndelta body four"))) // b keeps its promo
    assert(got(5L) == ((1, 0, "epsilon body five")))
  }

  test("matching is normalized, within-doc repeats count once but strip everywhere") {
    val rows = Seq(
      (1L, "s", "  PROMO \nbody one\npromo"),  // two promo variants, one doc
      (2L, "s", "promo\nbody two")
    )
    // doc-frequency of 'promo' = 2/2 docs (repeats in doc 1 count once)
    val got = strip(rows, frac = 100)
    assert(got(1L) == ((3, 2, "body one")))
    assert(got(2L) == ((2, 1, "body two")))
  }

  test("a doc that is all boilerplate cleans to the empty string") {
    val rows = Seq(
      (1L, "s", "promo"),
      (2L, "s", "promo\nreal content")
    )
    val got = strip(rows, frac = 100)
    assert(got(1L) == ((1, 1, "")))
    assert(got(2L) == ((2, 1, "real content")))
  }
}
