package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Trend

class TrendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(rows: Seq[(String, Long, Long)]) =
    rows.toDF("k", "x", "y")

  // ------------------------------------------------------------ olsTrend

  test("olsTrend recovers an exact line with r2 = 1") {
    // y = 10 + 3x on x = 0..4: num = 5*190-10*80 = 150, den_x = 50
    val out = Trend.olsTrend(
      series((0L to 4L).map(x => ("a", x, 10L + 3 * x))), "k", "x", "y").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("slope_ppm") == 3000000L)
    assert(out.head.getAs[Long]("r2_ppm") == 1000000L)
  }

  test("olsTrend: flat series has slope 0 and NULL r2 (zero y-variance)") {
    val out = Trend.olsTrend(
      series((0L to 3L).map(x => ("a", x, 7L))), "k", "x", "y").collect()
    assert(out.head.getAs[Long]("slope_ppm") == 0L)
    assert(out.head.isNullAt(out.head.fieldIndex("r2_ppm")))
  }

  test("olsTrend: slope is invariant to an x shift (re-based internally)") {
    val base = Trend.olsTrend(
      series(Seq(("a", 0L, 5L), ("a", 1L, 9L), ("a", 2L, 13L))), "k", "x", "y")
      .collect().head.getAs[Long]("slope_ppm")
    val shifted = Trend.olsTrend(
      series(Seq(("a", 19000L, 5L), ("a", 19001L, 9L), ("a", 19002L, 13L))),
      "k", "x", "y").collect().head.getAs[Long]("slope_ppm")
    assert(base == 4000000L && shifted == 4000000L)
  }

  test("olsTrend: a single point reports NULL slope (zero x-variance)") {
    val out = Trend.olsTrend(series(Seq(("a", 3L, 8L))), "k", "x", "y").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("slope_ppm")))
  }

  // --------------------------------------------------------- changePoint

  test("changePoint locates a level shift at the last pre-shift x") {
    // y = 0,0,0,10,10,10: D_t = |6P_t - 30t| peaks at t=3 (D=90)
    val out = Trend.changePoint(
      series(Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
        ("a", 4L, 10L), ("a", 5L, 10L), ("a", 6L, 10L))), "k", "x", "y").collect()
    val r = out.head
    assert(r.getAs[Long]("cp_x") == 3L)
    assert(r.getAs[Long]("d_max") == 90L)
    assert(r.getAs[Long]("d_max_pm") == 500000L) // 10^6*90 DIV (6*30)
  }

  test("changePoint: a constant-rate series scores 0 at the earliest x") {
    val out = Trend.changePoint(
      series((1L to 4L).map(x => ("a", x, 5L))), "k", "x", "y").collect()
    assert(out.head.getAs[Long]("d_max") == 0L)
    assert(out.head.getAs[Long]("d_max_pm") == 0L)
    assert(out.head.getAs[Long]("cp_x") == 1L) // every D_t ties at 0
  }

  test("changePoint keys are independent") {
    val out = Trend.changePoint(
      series(Seq(("a", 1L, 0L), ("a", 2L, 8L),
        ("b", 1L, 8L), ("b", 2L, 0L))), "k", "x", "y").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Long]("d_max") == 8L)) // |2*P1 - 8| = 8 both
  }

  // ----------------------------------------------------------------- acf

  test("acf of a period-2 alternating series: negative lag-1, positive lag-2") {
    // y = 0,10,0,10,0,10: d = ±30, den = 5400
    val out = Trend.acf(
      series((1L to 6L).map(x => ("a", x, if (x % 2 == 0) 10L else 0L))),
      "k", "x", "y", maxLag = 2).collect()
    val byLag = out.map(r => r.getAs[Long]("lag_k") -> r).toMap
    assert(byLag(1L).getAs[Long]("acf_pm") == -833333L) // 10^6*(-4500) DIV 5400
    assert(byLag(2L).getAs[Long]("acf_pm") == 666666L)  // 10^6*3600 DIV 5400
    assert(byLag(1L).getAs[Long]("n_pairs") == 5L)
    assert(byLag(2L).getAs[Long]("n_pairs") == 4L)
  }

  test("acf of a constant series is NULL (zero variance), not a crash") {
    val out = Trend.acf(
      series((1L to 4L).map(x => ("a", x, 3L))), "k", "x", "y", 1).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("acf_pm")))
  }

  test("acf re-indexes contiguously: calendar gaps collapse") {
    val gapped = Trend.acf(
      series(Seq(("a", 1L, 2L), ("a", 5L, 4L), ("a", 9L, 6L))), "k", "x", "y", 1)
      .collect().head.getAs[Long]("acf_pm")
    val dense = Trend.acf(
      series(Seq(("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L))), "k", "x", "y", 1)
      .collect().head.getAs[Long]("acf_pm")
    assert(gapped == dense)
  }

  // ------------------------------------------------------------ theilSen

  test("theilSen ignores a single outlier that would wreck OLS") {
    // y = 2x except (3,100): 6 pair slopes, lower median (rank 3) = 2e6
    val pts = series(Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 100L)))
    val out = Trend.theilSen(pts, "k", "x", "y").collect()
    assert(out.head.getAs[Long]("n_pairs") == 6L)
    assert(out.head.getAs[Long]("ts_slope_micro") == 2000000L)
    // contrast: OLS on the same points is dragged far above 2
    val ols = Trend.olsTrend(pts, "k", "x", "y").collect().head.getAs[Long]("slope_ppm")
    assert(ols > 20000000L)
  }

  test("theilSen handles negative slopes with toward-zero quantization") {
    val out = Trend.theilSen(
      series(Seq(("a", 0L, 10L), ("a", 1L, 7L), ("a", 2L, 4L))), "k", "x", "y")
      .collect()
    assert(out.head.getAs[Long]("n_pairs") == 3L)
    assert(out.head.getAs[Long]("ts_slope_micro") == -3000000L)
  }

  // ---------------------------------------------------- seasonalResiduals

  test("seasonal residuals: a perfectly periodic series has zero excess everywhere") {
    val out = Trend.seasonalResiduals(
      series(Seq(("a", 0L, 10L), ("a", 1L, 20L), ("a", 2L, 10L), ("a", 3L, 20L))),
      "k", "x", "y", period = 2, thresholdPm = 300L).collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("excess_pm") == 0L))
    assert(out.forall(!_.getAs[Boolean]("burst")))
  }

  test("seasonal residuals: excess is measured against the slot, not the global mean") {
    // slot 0 holds {10, 30}: x=0 reads -500pm, x=2 reads +500pm; slot 1 flat
    val out = Trend.seasonalResiduals(
      series(Seq(("a", 0L, 10L), ("a", 1L, 20L), ("a", 2L, 30L), ("a", 3L, 20L))),
      "k", "x", "y", period = 2, thresholdPm = 300L)
      .collect().map(r => r.getAs[Long]("x") ->
        ((r.getAs[Long]("excess_pm"), r.getAs[Boolean]("burst")))).toMap
    assert(out(0L) == ((-500L, true)) && out(2L) == ((500L, true)))
    assert(out(1L) == ((0L, false)) && out(3L) == ((0L, false)))
  }

  // ---------------------------------------------------- crossCorrelation

  test("cross-correlation: exact +-1e6 on perfectly linear pairs, ordered keys") {
    val rows = (0L to 2L).flatMap(x => Seq(
      ("a", x, x), ("b", x, 2 * x), ("c", x, 5 - x)))
    val out = Trend.crossCorrelation(series(rows), "k", "x", "y")
      .collect().map(r => (r.getAs[String]("key_a"), r.getAs[String]("key_b")) ->
        r.getAs[Long]("signed_r2_ppm")).toMap
    assert(out == Map(("a", "b") -> 1000000L, ("a", "c") -> -1000000L,
      ("b", "c") -> -1000000L))
  }

  test("cross-correlation: a constant side reports NULL, not a crash") {
    val rows = (0L to 2L).flatMap(x => Seq(("a", x, x), ("flat", x, 7L)))
    val out = Trend.crossCorrelation(series(rows), "k", "x", "y").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("signed_r2_ppm")))
  }

  // ------------------------------------------------- seasonalNaiveBacktest

  test("backtest: a period-2 series is perfectly seasonal-predictable") {
    // y = 1,5,1,5,1,5: e_s = 0 on all eval rows, e_1 = 4 each
    val out = Trend.seasonalNaiveBacktest(
      series((1L to 6L).map(x => ("a", x, if (x % 2 == 0) 5L else 1L))),
      "k", "x", "y", season = 2).collect()
    val r = out.head
    assert(r.getAs[Long]("n_eval") == 4L)
    assert(r.getAs[Long]("mae_seasonal_micro") == 0L)
    assert(r.getAs[Long]("mae_naive_micro") == 4000000L)
    assert(r.getAs[Long]("ratio_ppm") == 0L)
  }

  test("backtest: on a pure trend, persistence beats the season 2:1") {
    // y = 1..6, season 2: e_s = 2, e_1 = 1 on each of 4 eval rows
    val out = Trend.seasonalNaiveBacktest(
      series((1L to 6L).map(x => ("a", x, x))), "k", "x", "y", season = 2)
      .collect()
    assert(out.head.getAs[Long]("ratio_ppm") == 2000000L)
  }

  test("backtest: a constant series reports NULL ratio (0/0), not a crash") {
    val out = Trend.seasonalNaiveBacktest(
      series((1L to 5L).map(x => ("a", x, 3L))), "k", "x", "y", season = 2)
      .collect()
    assert(out.head.getAs[Long]("mae_seasonal_micro") == 0L)
    assert(out.head.isNullAt(out.head.fieldIndex("ratio_ppm")))
  }

  test("backtest evaluates both forecasters on the same rows only") {
    // 3 points, season 2: exactly one eval row (t = 3)
    val out = Trend.seasonalNaiveBacktest(
      series(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 40L))),
      "k", "x", "y", season = 2).collect()
    assert(out.head.getAs[Long]("n_eval") == 1L)
    assert(out.head.getAs[Long]("mae_seasonal_micro") == 30000000L) // |40-10|
    assert(out.head.getAs[Long]("mae_naive_micro") == 20000000L)    // |40-20|
  }

  // ------------------------------------------------------------ ewmaSeries

  test("ewma: hand-computed truncating trajectory, alpha = 1/5") {
    // e1 = 10e6; e2 = (20e6 + 4*10e6)/5 = 12e6; e3 = (1*5e6+4*12e6)/5
    //    = 53e6/5 = 10600000
    val out = Trend.ewmaSeries(
      series(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 5L))),
      "k", "x", "y", aNum = 1L, aDen = 5L)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 10000000L), (2L, 12000000L), (3L, 10600000L)))
  }

  test("ewma: alpha = 1 tracks the series exactly; keys independent") {
    val out = Trend.ewmaSeries(
      series(Seq(("a", 1L, 3L), ("a", 2L, 9L), ("b", 1L, 7L))),
      "k", "x", "y", aNum = 1L, aDen = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == Seq(("a", 1L, 3000000L), ("a", 2L, 9000000L),
      ("b", 1L, 7000000L)))
  }

  // ---------------------------------------------------------- holtForecast

  test("holt: constant series forecasts itself with zero trend") {
    val out = Trend.holtForecast(
      series(Seq(("a", 1L, 50L), ("a", 2L, 50L), ("a", 3L, 50L))),
      "k", "x", "y", 1L, 5L, 1L, 10L, horizon = 3)
      .collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Long]("trend_micro") == 0L))
    assert(out.forall(_.getAs[Long]("forecast_micro") == 50000000L))
  }

  test("holt: hand-computed level/trend on a rising series") {
    // y = 10, 20: l1 = 10e6, b1 = 0
    // l2 = (20e6 + 4*(10e6+0))/5 = 12e6
    // b2 = (1*(12e6-10e6) + 9*0)/10 = 200000
    // h=1 -> 12200000, h=2 -> 12400000
    val out = Trend.holtForecast(
      series(Seq(("a", 1L, 10L), ("a", 2L, 20L))),
      "k", "x", "y", 1L, 5L, 1L, 10L, horizon = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 12200000L), (2L, 12400000L)))
  }

  test("holt: falling series carries a negative trend (signed DIV)") {
    // y = 20, 10: l2 = (10e6 + 4*20e6)/5 = 18e6; b2 = (-2e6)/10 = -200000
    val out = Trend.holtForecast(
      series(Seq(("a", 1L, 20L), ("a", 2L, 10L))),
      "k", "x", "y", 1L, 5L, 1L, 10L, horizon = 1)
      .collect().head
    assert(out.getAs[Long]("trend_micro") == -200000L)
    assert(out.getAs[Long]("forecast_micro") == 17800000L)
  }

  test("cusumFrom: continuation from (target, S) state equals the full-history run") {
    import spark.implicits._
    val full = Trend.cusum(
      series(Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
        ("a", 4L, 20L), ("a", 5L, 30L), ("a", 6L, 5L))),
      "k", "x", "y", baseline = 3, slackMicro = 1000000L,
      hMicro = 20000000L).collect()
    // state after day 4: (target 10e6+slack handled in op; S = 9e6)
    val state = Seq(("a", 10000000L, 9000000L))
      .toDF("k", "target_micro", "cusum_micro")
    val cont = Trend.cusumFrom(
      series(Seq(("a", 5L, 30L), ("a", 6L, 5L))),
      "k", "x", "y", state, slackMicro = 1000000L, hMicro = 20000000L)
      .collect()
    val canon = (rs: Array[org.apache.spark.sql.Row]) => rs.map(r =>
      r.getAs[Long]("x") -> (r.getAs[Long]("cusum_micro"),
        r.getAs[Long]("alarm"))).toMap
    val tail = canon(full.filter(_.getAs[Long]("x") > 4L))
    assert(canon(cont) == tail && tail.nonEmpty)
    // S5 = max(0, 9e6 + 30e6 - 11e6) = 28e6 (alarm), S6 = 22e6 (alarm)
    assert(tail(5L) == ((28000000L, 1L)) && tail(6L) == ((22000000L, 1L)))
  }

  test("densify: gaps zero-fill within each key's own span; dupes aggregate") {
    val out = Trend.densify(
      series(Seq(("a", 3L, 5L), ("a", 3L, 2L), ("a", 6L, 1L),
        ("b", 10L, 4L))),
      "k", "x", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 3L, 7L, 0L), ("a", 4L, 0L, 1L), ("a", 5L, 0L, 1L),
      ("a", 6L, 1L, 0L),
      ("b", 10L, 4L, 0L))) // single-point span: no fill rows
  }

  // ---------------------------------------------------------- holtWinters

  test("holt-winters: hand trajectory with a period-2 ring (signed seasonals)") {
    // y = 10,20,12,22; p = 2 -> l0 = 15e6, s = [-5e6, 5e6], b = 0
    // i=3 slot 0: l = ((12e6+5e6) + 15e6) DIV 2 = 16e6
    //            b = (1e6 + 0) DIV 2 = 5e5
    //            s0 = ((12e6-16e6) + -5e6) DIV 2 = -4500000 (trunc toward 0)
    // i=4 slot 1: l = ((22e6-5e6) + 16.5e6) DIV 2 = 16750000
    //            b = (750000 + 500000) DIV 2 = 625000
    //            s1 = ((22e6-16.75e6) + 5e6) DIV 2 = 5125000
    // h=1 -> slot 0: 16.75e6 + 625000 - 4.5e6 = 12875000
    // h=2 -> slot 1: 16.75e6 + 1.25e6 + 5.125e6 = 23125000
    val out = Trend.holtWinters(
      series(Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 12L),
        ("a", 4L, 22L))),
      "k", "x", "y", period = 2, 1L, 2L, 1L, 2L, 1L, 2L, horizon = 2)
      .collect().map(r => r.getAs[Long]("h") ->
        (r.getAs[Long]("forecast_micro"), r.getAs[Long]("level_micro"),
          r.getAs[Long]("trend_micro"), r.getAs[Long]("seasonal_micro")))
      .toMap
    assert(out(1L) == ((12875000L, 16750000L, 625000L, -4500000L)))
    assert(out(2L) == ((23125000L, 16750000L, 625000L, 5125000L)))
  }

  test("holt-winters: flat seasonal series forecasts its own pattern; short keys dropped") {
    // y repeats 10,30 exactly: l stays 20e6, b 0, s = [-10e6, +10e6]
    val rows = (1L to 8L).map(i => ("a", i, if (i % 2 == 1) 10L else 30L)) :+
      (("b", 1L, 5L)) :+ (("b", 2L, 6L)) // only 2 points: dropped (p+1 needed)
    val out = Trend.holtWinters(series(rows), "k", "x", "y",
      period = 2, 1L, 2L, 1L, 2L, 1L, 2L, horizon = 4).collect()
    assert(out.forall(_.getString(0) == "a"))
    val f = out.map(r => r.getAs[Long]("h") -> r.getAs[Long]("forecast_micro")).toMap
    assert(f(1L) == 10000000L && f(2L) == 30000000L &&
      f(3L) == 10000000L && f(4L) == 30000000L)
  }

  // ---------------------------------------------------------------- cusum

  test("cusum: hand trajectory — creep accumulates, reset pins at zero") {
    // y = 10,10,10,20,30; baseline 3 -> tgt = 10e6; slack 1e6:
    // S = max(0, prev + y*1e6 - 11e6): 0, 0, 0, 9e6, 28e6; h = 20e6
    val out = Trend.cusum(
      series(Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
        ("a", 4L, 20L), ("a", 5L, 30L))),
      "k", "x", "y", baseline = 3, slackMicro = 1000000L,
      hMicro = 20000000L)
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("cusum_micro"),
        r.getAs[Long]("alarm")))
    assert(out.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L),
      (4L, 9000000L, 0L), (5L, 28000000L, 1L)))
  }

  test("cusum: baseline longer than the series uses the whole series; keys independent") {
    // key b: y = 4, 10; baseline 3 -> tgt = (14e6) DIV 2 = 7e6; slack 0:
    // S1 = max(0, 4e6-7e6) = 0; S2 = max(0, 0+10e6-7e6) = 3e6
    val out = Trend.cusum(
      series(Seq(("b", 1L, 4L), ("b", 2L, 10L), ("c", 1L, 100L))),
      "k", "x", "y", baseline = 3, slackMicro = 0L, hMicro = 1000000L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("x"),
        r.getAs[Long]("cusum_micro"))).toSet
    assert(out(("b", 1L, 0L)) && out(("b", 2L, 3000000L)))
    assert(out(("c", 1L, 0L))) // own target: 100e6 - 100e6 = 0
  }

  // ----------------------------------------------------------- maxDrawdown

  test("drawdown: deepest slump and its earliest trough") {
    // peaks 50 -> trough 10 (dd 40 at x=4); the later dd 40 at x=6 loses
    // the earliest-x tie-break
    val out = Trend.maxDrawdown(
      series(Seq(("a", 1L, 30L), ("a", 2L, 50L), ("a", 3L, 20L),
        ("a", 4L, 10L), ("a", 5L, 45L), ("a", 6L, 10L))),
      "k", "x", "y").collect().head
    assert(out.getAs[Long]("peak_y") == 50L)
    assert(out.getAs[Long]("max_dd") == 40L)
    assert(out.getAs[Long]("trough_x") == 4L)
  }

  test("drawdown: monotone rise has zero drawdown, trough at the start") {
    val out = Trend.maxDrawdown(
      series(Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L))),
      "k", "x", "y").collect().head
    assert(out.getAs[Long]("max_dd") == 0L && out.getAs[Long]("trough_x") == 1L)
  }
}
