package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Drift

class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drift(rows: Seq[(String, String)]): Map[String, (Long, Long, Long)] =
    Drift.tokenDrift(rows.toDF("source", "text"), "text", "source")
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct_tokens"),
          r.getAs[Long]("kl_micros"))))
      .toMap

  test("a source matching the blend has (near-)zero KL; a skewed source is positive") {
    // two sources with identical token distributions -> corpus == each
    // source -> every ln term is ln(1) = 0 exactly
    val same = drift(Seq(("s1", "a b c a"), ("s2", "a b c a")))
    assert(same("s1") == ((4L, 3L, 0L)))
    assert(same("s2") == ((4L, 3L, 0L)))

    // one source all-x, the other all-y: each sees its token at p=1 vs
    // corpus q=0.5 -> KL = ln 2 = 0.693147... -> 693147 micro-nats
    val split = drift(Seq(("sx", "x x x x"), ("sy", "y y y y")))
    assert(split("sx") == ((4L, 1L, 693147L)))
    assert(split("sy") == ((4L, 1L, 693147L)))
  }

  test("KL is non-negative and counts are exact on mixed corpora") {
    val r = drift(Seq(
      ("news", "the market rose the index fell the outlook"),
      ("spam", "win win win free free prize"),
      ("docs", "the index outlook and the market")))
    r.values.foreach { case (_, _, kl) => assert(kl >= 0L) }
    assert(r("news")._1 == 8L && r("news")._2 == 6L)
    assert(r("spam")._1 == 6L && r("spam")._2 == 3L)
    // the off-profile source diverges more than the on-profile ones
    assert(r("spam")._3 > r("news")._3 && r("spam")._3 > r("docs")._3)
  }

  test("empty input yields an empty result, not an NPE") {
    assert(drift(Nil).isEmpty)
    // all-token-less input likewise reduces to zero counts
    assert(drift(Seq(("a", "   "), ("b", ""))).isEmpty)
  }

  test("token-less docs contribute nothing; single-source corpus is exactly zero") {
    val r = drift(Seq(("only", "a b a"), ("only", "   ")))
    assert(r("only") == ((3L, 2L, 0L)))
  }
}
