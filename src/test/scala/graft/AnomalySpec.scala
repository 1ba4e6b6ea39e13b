package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One event per (segment, bucket, i) — rates controlled per bucket. */
  private def events(rates: Seq[(String, Long, Int)]) = {
    val rows = rates.flatMap { case (seg, bucket, n) =>
      (0 until n).map(i => (seg, bucket * 1000L + i))
    }
    rows.toDF("seg", "ms").select($"seg",
      timestamp_millis($"ms").as("ts"))
  }

  test("flat series never alarms; a spike does; recovery clears it") {
    // 20 quiet buckets at rate 10, then one bucket at 100, then back to 10
    val rates = (0L until 20L).map(b => ("api", b, 10)) :+
      (("api", 20L, 100)) :+ (("api", 21L, 10))
    val got = Anomaly.rateAnomalies(events(rates), "seg", "ts",
        bucketMs = 1000L, history = 24, sigmas = 3, minHistory = 4)
      .orderBy("bucket")
      .select("bucket", "n_events", "is_anomaly")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val anomalies = got.filter(_._3).map(_._1).toSet
    assert(anomalies == Set(20L), s"got $anomalies")
    // σ=0 history would make ANY deviation an alarm — verify the strict
    // inequality keeps the identical-rate bucket quiet
    assert(!got.find(_._1 == 19L).get._3)
  }

  test("minHistory gates early buckets; per-segment isolation") {
    val rates = Seq(("a", 0L, 5), ("a", 1L, 500), // only 1 trailing bucket
      ("b", 0L, 5), ("b", 1L, 5), ("b", 2L, 5), ("b", 3L, 5), ("b", 4L, 500))
    val got = Anomaly.rateAnomalies(events(rates), "seg", "ts",
        bucketMs = 1000L, history = 24, sigmas = 3, minHistory = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(6)).toMap
    assert(!got(("a", 1L)), "insufficient history must not alarm")
    assert(got(("b", 4L)), "b's spike has 4 trailing buckets and must alarm")
    intercept[IllegalArgumentException](
      Anomaly.rateAnomalies(events(rates), "seg", "ts", bucketMs = 0L))
  }

  test("robustOutliers: MAD screen flags the spike, zero-MAD segments abstain") {
    import spark.implicits._
    // segment a: values 10..19 + one 1000 -> med ~14.5, outlier flagged
    // segment b: constant -> mad = 0 -> null verdicts
    val rows = ((10L to 19L).map(v => ("a", v)) :+ (("a", 1000L))) ++
      Seq(("b", 5L), ("b", 5L), ("b", 5L))
    val got = graft.operators.Anomaly.robustOutliers(
        rows.toDF("seg", "x"), "x", "seg")
      .collect().map(r => (r.getAs[String]("segment"), r.getAs[Long]("x")) ->
        ((Option(r.get(r.fieldIndex("mz_micros"))),
          Option(r.get(r.fieldIndex("is_outlier")))))).toMap
    assert(got(("a", 1000L))._2 == Some(true))
    assert(got(("a", 15L))._2 == Some(false))
    // robustness: the outlier barely moves the median-based score of inliers
    assert(math.abs(got(("a", 15L))._1.get.asInstanceOf[Long]) < 3500000L)
    assert(got(("b", 5L)) == ((None, None)))
  }

  test("integer identity matches the double formula on a varied series") {
    // trailing window with genuine variance: rates 8..12 cycling, spike at 30
    val rates = (0L until 12L).map(b => ("s", b, 8 + (b % 5).toInt)) :+ (("s", 12L, 30))
    val got = Anomaly.rateAnomalies(events(rates), "seg", "ts",
        bucketMs = 1000L, history = 24, sigmas = 3, minHistory = 4)
      .orderBy("bucket").collect()
    got.filter(_.getLong(3) >= 4).foreach { r =>
      val (x, n, s, q) = (r.getLong(2).toDouble, r.getLong(3).toDouble,
        r.getLong(4).toDouble, r.getLong(5).toDouble)
      val mean = s / n
      val sigma = math.sqrt(q / n - mean * mean)
      val expect = math.abs(x - mean) > 3 * sigma
      assert(r.getBoolean(6) == expect, s"bucket ${r.getLong(1)}")
    }
  }

  private def regularity(rows: Seq[(Long, Long)], minGaps: Long = 2L,
      thresholdPm: Long = 1000L) =
    Anomaly.interArrivalRegularity(
      rows.zipWithIndex.map { case ((u, ms), i) => (u, ms, i.toLong) }
        .toDF("u", "ms", "eid")
        .select($"u", timestamp_millis($"ms").as("ts"), $"eid"),
      "u", "ts", "eid", minGaps, thresholdPm)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("regularity: metronome flags, bursty organic does not, hand-check cv2") {
    val bot = (0L until 11L).map(ms => (1L, ms * 1000L))      // exact 1s gaps
    val organic = Seq(0L, 500L, 4500L, 5000L, 20000L, 21000L, 22500L,
      40000L, 41000L, 47000L, 60000L).map((2L, _))            // bursty
    val got = regularity(bot ++ organic, minGaps = 10L)
    assert(got(1L) == ((10L, 1000L, 0L, true)))               // cv2 exactly 0
    assert(got(2L)._3 > 1000L && !got(2L)._4)
  }

  test("regularity: hand-computed cv2_pm on two gaps") {
    // gaps 1000, 3000: n=2, s1=4000, s2=1e7 ->
    // (2e7-1.6e7)*1e4 DIV 1.6e7 = 2500
    val got = regularity(Seq((7L, 0L), (7L, 1000L), (7L, 4000L)))
    assert(got(7L) == ((2L, 2000L, 2500L, false)))
  }

  test("regularity: zero-delay replay reports cv2 0; minGaps excludes thin users") {
    val got = regularity(Seq((1L, 5L), (1L, 5L), (1L, 5L), (2L, 0L), (2L, 9L)),
      minGaps = 2L)
    assert(got(1L) == ((2L, 0L, 0L, true))) // all-zero gaps: maximally regular
    assert(!got.contains(2L)) // 1 gap < minGaps: no evidence, no verdict
    intercept[IllegalArgumentException](
      regularity(Seq((1L, 0L), (1L, 1L)), minGaps = 1L))
  }

  test("hampel: spike flagged by median/MAD, level edges tolerated") {
    import graft.operators.Anomaly
    val series = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L),
      ("a", 4L, 50L), ("a", 5L, 5L), ("a", 6L, 5L), ("a", 7L, 5L))
      .toDF("k", "x", "y")
    val out = Anomaly.hampel(series, "k", "x", "y", half = 1, kPct = 300L)
      .collect().map(r => r.getAs[Long]("x") ->
        (r.getAs[Long]("med"), r.getAs[Long]("mad"), r.getAs[Long]("outlier")))
      .toMap
    // day 4's window [5,50,5]: med 5, mad 0 -> any deviation flags
    assert(out(4L) == ((5L, 0L, 1L)))
    // its neighbors see the spike in-window but sit AT the median
    assert(out(3L) == ((5L, 0L, 0L)) && out(5L) == ((5L, 0L, 0L)))
    // edge windows (2 points) use the lower median
    assert(out(1L) == ((5L, 0L, 0L)))
  }

  test("hampel: MAD > 0 scales the threshold; keys independent") {
    import graft.operators.Anomaly
    // day 2's full window [10,20,30]: med 20, devs sorted [0,10,10] ->
    // mad 10; k = 300% -> flag iff 100|y-20| > 3000: y=20 -> 0, no flag.
    // Edge day 3's window [20,30]: lower med 20, mad 0 -> its own
    // y=30 deviation (1000 > 0) flags — the mad=0 convention applies
    // to short edge windows too.
    val series = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 1L, 100L)).toDF("k", "x", "y")
    val out = Anomaly.hampel(series, "k", "x", "y", half = 1, kPct = 300L)
      .collect().map(r => (r.getString(0), r.getAs[Long]("x")) ->
        (r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Long]("outlier"))).toMap
    assert(out(("a", 2L)) == ((20L, 10L, 0L)))
    assert(out(("a", 3L)) == ((20L, 0L, 1L)))
    assert(out(("b", 1L)) == ((100L, 0L, 0L)))
  }

  test("interEventGaps: histogram, cumulative counts, counting median") {
    import graft.operators.Anomaly
    // u1: days 1,2,5 -> gaps 1,3; u2: days 1,4 -> gap 3
    val df = Seq(("t", "u1", 1L), ("t", "u1", 2L), ("t", "u1", 5L),
      ("t", "u2", 1L), ("t", "u2", 4L), ("t", "u2", 4L)) // dup day collapses
      .toDF("k", "ent", "d")
    val out = Anomaly.interEventGaps(df, "k", "ent", "d")
      .collect().map(r => (r.getAs[Long]("gap_days"), r.getAs[Long]("n"),
        r.getAs[Long]("cum_n"), r.getAs[Long]("total"),
        r.getAs[Long]("is_median")))
    assert(out.toSeq == Seq((1L, 1L, 1L, 3L, 0L), (3L, 2L, 3L, 3L, 1L)))
  }
}
