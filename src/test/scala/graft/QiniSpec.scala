package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LiftAudit

class QiniSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def curve(rows: Seq[(Long, Boolean, Boolean)]) =
    LiftAudit.qiniCurve(rows.toDF("score", "treated", "conv"),
      "score", col("treated"), col("conv"))

  test("qini: hand-computed two-threshold curve ends on the diagonal") {
    // s=2: T 2 (1 conv) vs C 2 (0) — uplift concentrated up top
    // s=1: T 2 (0 conv) vs C 2 (1) — paid back at the bottom
    val rows = Seq(
      (2L, true, true), (2L, true, false), (2L, false, false), (2L, false, false),
      (1L, true, false), (1L, true, false), (1L, false, true), (1L, false, false))
    val out = curve(rows).collect()
    assert(out.map(_.getAs[Long]("score")).toList == List(2L, 1L))
    assert(out(0).getAs[Long]("qini_milli") == 1000L)
    assert(out(0).getAs[Long]("rand_milli") == 0L) // null overall effect
    assert(out(0).getAs[Long]("excess_milli") == 1000L)
    // the curve always rejoins the diagonal at the last threshold
    assert(out(1).getAs[Long]("excess_milli") == 0L)
  }

  test("qini: identical treated/control cells hug the diagonal everywhere") {
    val rows = (1L to 4L).flatMap(s => Seq(
      (s, true, s % 2 == 0), (s, false, s % 2 == 0),
      (s, true, false), (s, false, false)))
    val out = curve(rows).collect()
    out.foreach(r => assert(r.getAs[Long]("excess_milli") == 0L))
  }

  test("qini: a genuinely persuasive score bows above the diagonal") {
    // top score: treatment converts everyone, control nobody;
    // bottom: nobody converts — overall effect positive, curve above
    val rows = Seq.fill(5)((9L, true, true)) ++ Seq.fill(5)((9L, false, false)) ++
      Seq.fill(5)((1L, true, false)) ++ Seq.fill(5)((1L, false, false))
    val out = curve(rows).collect()
    assert(out(0).getAs[Long]("excess_milli") > 0L)
    assert(out(1).getAs[Long]("excess_milli") == 0L)
    // cumulative bookkeeping: totals double from first to last threshold
    assert(out(1).getAs[Long]("cum_n_t") == 10L)
    assert(out(1).getAs[Long]("cum_n_c") == 10L)
  }
}
