package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.LiftAudit

class LiftAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table(rows: Seq[(Long, Boolean)], lo: Long = 0L, hi: Long = 100L,
      bands: Int = 10) =
    LiftAudit.liftTable(rows.toDF("score", "label"), "score", "label",
      lo, hi, bands).collect()

  test("a perfect scorer shows top-band lift = N/positives") {
    // 100 rows, 10 positives all scoring 95+ (band 9)
    val rows = (1L to 90L).map(i => (i % 50, false)) ++
      (1L to 10L).map(i => (95L + (i % 5), true))
    val out = table(rows)
    val top = out.head
    assert(top.getAs[Long]("band") == 9L)
    assert(top.getAs[Long]("n_pos") == 10L && top.getAs[Long]("n") == 10L)
    assert(top.getAs[Long]("lift_pm") == 100000L) // 10x base rate
  }

  test("the bottom cumulative row is exactly the base rate (lift 1x)") {
    val rows = (1L to 97L).map(i => (i % 100, i % 3 == 0))
    val out = table(rows)
    assert(out.last.getAs[Long]("cum_n") == 97L)
    assert(out.last.getAs[Long]("lift_pm") == 10000L)
  }

  test("out-of-range scores clamp into edge bands; nothing is dropped") {
    val rows = Seq((-500L, true), (0L, false), (99L, false), (5000L, true))
    val out = table(rows)
    assert(out.map(_.getAs[Long]("n")).sum == 4L)
    assert(out.map(_.getAs[Long]("band")).toSet == Set(0L, 9L))
    assert(out.find(_.getAs[Long]("band") == 9L).get.getAs[Long]("n_pos") == 1L)
  }

  test("zero positives: lift reports 0 rather than dividing by zero") {
    val out = table(Seq((10L, false), (80L, false)))
    out.foreach(r => assert(r.getAs[Long]("lift_pm") == 0L))
  }

  test("band edges are integer floor boundaries") {
    // width 100, 10 bands: score 9 -> band 0, score 10 -> band 1
    val out = table(Seq((9L, false), (10L, true)))
    val byBand = out.map(r => r.getAs[Long]("band") -> r.getAs[Long]("band_lo")).toMap
    assert(byBand == Map(0L -> 0L, 1L -> 10L))
  }

  // -------------------------------------------------- calibrationReport

  private def calib(rows: Seq[(Long, Boolean)]) =
    LiftAudit.calibrationReport(rows.toDF("conf", "label"), col("conf"), "label")
      .collect()

  test("a perfectly calibrated scorer has zero gap in every bin and ECE 0") {
    // bin 1: 10 rows at conf 100, exactly 1 positive; bin 5: 2 at 500, 1 pos
    val rows = (1 to 10).map(i => (100L, i == 1)) ++
      Seq((500L, true), (500L, false))
    val out = calib(rows)
    assert(out.forall(_.getAs[Long]("gap_pm_n") == 0L))
    assert(out.forall(_.getAs[Long]("ece_pm") == 0L))
  }

  test("an overconfident scorer pays its full gap into ECE") {
    // 10 rows claiming 900pm, zero positives: ECE = 9000/10 = 900pm
    val out = calib((1 to 10).map(_ => (900L, false)))
    assert(out.length == 1)
    assert(out.head.getAs[Long]("gap_pm_n") == 9000L)
    assert(out.head.getAs[Long]("ece_pm") == 900L)
    assert(out.head.getAs[Long]("avg_conf_pm") == 900L)
    assert(out.head.getAs[Long]("acc_pm") == 0L)
  }

  test("ECE weights bins by mass, not equally") {
    // big bin gap 0, small bin fully wrong: ECE = (0 + 2*1000)/12
    val rows = (1 to 10).map(i => (100L, i == 1)) ++
      Seq((999L, false), (999L, false))
    val out = calib(rows)
    assert(out.map(_.getAs[Long]("ece_pm")).distinct.toSeq == Seq(2000L / 12))
  }

  test("calibration clamps out-of-range confidence into edge bins") {
    val out = calib(Seq((-50L, false), (2000L, true)))
    assert(out.map(_.getAs[Long]("bin")).toSet == Set(0L, 9L))
    assert(out.map(_.getAs[Long]("n")).sum == 2L)
  }

  // --------------------------------------------------------- woeTable

  test("WoE/IV: hand-computed micro-nats, pure bands excluded from IV") {
    // band 0: 4+/1-, band 1: 1+/4-, band 2: 2+/0- (pure); P=7, N=5
    val rows = Seq.fill(4)((0L, true)) ++ Seq((0L, false)) ++
      Seq((1L, true)) ++ Seq.fill(4)((1L, false)) ++ Seq.fill(2)((2L, true))
    val out = LiftAudit.woeTable(rows.toDF("band", "label"), col("band"), "label")
      .collect().map(r => r.getAs[Long]("band") -> r).toMap
    // woe0 = ln((4*5)/(1*7)) = ln(20/7) = 1049822; woe1 = ln(5/28) = -1722767
    assert(out(0L).getAs[Long]("woe_micro") == 1049822L)
    assert(out(1L).getAs[Long]("woe_micro") == -1722767L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("woe_micro")))
    assert(out(0L).getAs[Long]("term") == 13L * 1049822L)  // 4*5-1*7 = 13
    assert(out(1L).getAs[Long]("term") == 23L * 1722767L)  // (5-28)*(-woe)
    // iv = (13649686 + 39623641) DIV 35
    assert(out(0L).getAs[Long]("iv_micro") ==
      (13L * 1049822L + 23L * 1722767L) / 35L)
    assert(out(0L).getAs[Long]("n_pure") == 1L)
  }

  test("WoE: a no-signal band sits at exactly zero evidence") {
    // band shares equal to class shares: woe = ln(1) = 0
    val rows = Seq.fill(2)((0L, true)) ++ Seq.fill(2)((0L, false)) ++
      Seq.fill(3)((1L, true)) ++ Seq.fill(3)((1L, false))
    val out = LiftAudit.woeTable(rows.toDF("band", "label"), col("band"), "label")
      .collect()
    assert(out.forall(_.getAs[Long]("woe_micro") == 0L))
    assert(out.head.getAs[Long]("iv_micro") == 0L)
  }
}
