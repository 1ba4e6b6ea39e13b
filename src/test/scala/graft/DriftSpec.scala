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

  private def cosines(rows: Seq[(String, Seq[Float])]) = {
    import spark.implicits._
    graft.operators.Drift.centroidCosines(
      rows.toDF("grp", "vec"), "grp", "vec")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
  }

  test("centroid cosines: orthogonal, parallel, and summed centroids") {
    val got = cosines(Seq(
      ("g1", Seq(1.0f, 0.0f)),
      ("g2", Seq(0.0f, 1.0f)),
      ("g3", Seq(2.0f, 0.0f)),
      ("g4", Seq(1.0f, 1.0f)), ("g4", Seq(1.0f, -1.0f)))) // centroid (2000, 0)
    assert(got(("g1", "g2")) == ((0L, 1000000L, 1000000L, 0.0)))
    // parallel centroids: exact 1.0 (integer dot over exact norms)
    assert(got(("g1", "g3")) == ((2000000L, 1000000L, 4000000L, 1.0)))
    assert(got(("g1", "g4"))._4 == 1.0)
    assert(got(("g3", "g4")) == ((4000000L, 4000000L, 4000000L, 1.0)))
    assert(got.size == 6) // 4 choose 2, each pair once, grp_a < grp_b
  }

  test("quantization follows the explicit floor(v*q + 0.5) rule on halves") {
    // 0.0625 is float-exact and 0.0625*1000 = 62.5 is double-exact, so
    // the halves genuinely land on the boundary: +62.5 -> floor(63.0)
    // = 63, but -62.5 -> floor(-62.0) = -62 (floor+0.5 is half-toward-
    // +inf, NOT half-away-from-zero — the rule both engines replay)
    val got = cosines(Seq(
      ("n", Seq(-0.0625f, 1.0f)),
      ("p", Seq(0.0625f, 1.0f)),
      ("z", Seq(0.0f, 1.0f))))
    assert(got(("p", "z"))._2 == 63L * 63L + 1000000L)  // p quantized to 63
    assert(got(("n", "p"))._2 == 62L * 62L + 1000000L)  // n quantized to -62
    assert(got(("n", "z"))._2 == 62L * 62L + 1000000L)
    assert(got(("n", "p"))._1 == -62L * 63L + 1000000L) // signed dot
  }

  test("centroidCosines guard: quant >= 1") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      graft.operators.Drift.centroidCosines(
        Seq(("g", Seq(1.0f))).toDF("grp", "vec"), "grp", "vec", quant = 0L))
  }

  test("PSI: hand-computed micro-nat terms, one-sided cells excluded not poisoning") {
    import org.apache.spark.sql.functions.col
    // expected: A=6, B=4 (Te=10); actual: A=3, B=5, C=2 (Ta=10)
    val rows = Seq.fill(6)(("A", true)) ++ Seq.fill(4)(("B", true)) ++
      Seq.fill(3)(("A", false)) ++ Seq.fill(5)(("B", false)) ++
      Seq.fill(2)(("C", false))
    val out = graft.operators.Drift.psiReport(
        rows.toDF("cell", "e"), col("e"), col("cell"))
      .collect().map(r => r.getAs[String]("cell") -> r).toMap
    assert(out("A").getAs[Long]("lnr_micro") == 693147L)  // ln 2
    assert(out("A").getAs[Long]("term") == 30L * 693147L)
    assert(out("B").getAs[Long]("lnr_micro") == -223144L) // ln 0.8
    assert(out("B").getAs[Long]("term") == 2231440L)      // (-10)*(-223144)
    assert(out("C").isNullAt(out("C").fieldIndex("term")))
    // psi = (20794410 + 2231440) DIV (10*10)
    assert(out("A").getAs[Long]("psi_micro") == 230258L)
    assert(out("A").getAs[Long]("n_one_sided") == 1L)
    assert(out("A").getAs[Long]("n_expected_total") == 10L)
    assert(out("A").getAs[Long]("n_actual_total") == 10L)
  }

  test("PSI: identical distributions read exactly zero") {
    import org.apache.spark.sql.functions.col
    val rows = Seq.fill(4)(("A", true)) ++ Seq.fill(6)(("B", true)) ++
      Seq.fill(2)(("A", false)) ++ Seq.fill(3)(("B", false))
    val out = graft.operators.Drift.psiReport(
      rows.toDF("cell", "e"), col("e"), col("cell")).collect()
    assert(out.forall(_.getAs[Long]("psi_micro") == 0L))
    assert(out.forall(_.getAs[Long]("term") == 0L)) // counts differ, shares don't
  }
}
