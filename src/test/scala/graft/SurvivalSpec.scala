package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Survival

class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("timeToNextDurations: gaps, censoring at horizon, same-day zero") {
    // user 1: days 10 -> 12 -> 12 (same-day pair), last censored at h=15
    // user 2: day 15 only, censored with dur 0 (last day IS the horizon)
    val df = Seq(
      (1L, 100L, 1000L, 10L), (1L, 200L, 2000L, 12L), (1L, 201L, 2001L, 12L),
      (2L, 300L, 3000L, 15L)
    ).toDF("user_id", "event_id", "tms", "day")
    val out = Survival.timeToNextDurations(df, "user_id", "day",
        Seq("tms", "event_id"))
      .collect().map(r => (r.getAs[Long]("dur"), r.getAs[Long]("observed")))
      .sorted.toList
    // observed: 2 (10->12), 0 (12->12 same day); censored: 15-12=3, 15-15=0
    assert(out == List((0L, 0L), (0L, 1L), (2L, 1L), (3L, 0L)))
  }

  test("nelsonAalen: hand-computed risk sets, hazards, cumulative sum") {
    // buckets: d=1 (2 events, 1 censored), d=3 (1 event)
    val subj = Seq((1L, 1L), (1L, 1L), (1L, 0L), (3L, 1L))
      .toDF("dur", "observed")
    val out = Survival.nelsonAalen(subj).collect()
    assert(out.map(_.getAs[Long]("dur_day")).toList == List(1L, 3L))
    val d1 = out(0); val d3 = out(1)
    assert(d1.getAs[Long]("at_risk") == 4L)
    assert(d1.getAs[Long]("events") == 2L)
    assert(d1.getAs[Long]("censored") == 1L)
    assert(d1.getAs[Long]("hazard_ppm") == 500000L)    // 2/4
    assert(d3.getAs[Long]("at_risk") == 1L)
    assert(d3.getAs[Long]("hazard_ppm") == 1000000L)   // 1/1
    assert(d3.getAs[Long]("cum_hazard_ppm") == 1500000L)
  }

  test("nelsonAalen: censoring shrinks the risk set but adds no events") {
    // all-censored input: every hazard is exactly zero
    val subj = Seq((2L, 0L), (5L, 0L)).toDF("dur", "observed")
    val out = Survival.nelsonAalen(subj).collect()
    assert(out.forall(_.getAs[Long]("hazard_ppm") == 0L))
    assert(out.forall(_.getAs[Long]("cum_hazard_ppm") == 0L))
    assert(out.map(_.getAs[Long]("at_risk")).toList == List(2L, 1L))
  }

  test("logrank: mirror-image groups give exactly zero statistic") {
    val subj = Seq((1L, 1L, true), (1L, 1L, false), (3L, 1L, true),
      (3L, 1L, false), (4L, 0L, true), (4L, 0L, false))
      .toDF("dur", "observed", "g")
    val r = Survival.logRank(subj, "dur", "observed", col("g"))
      .collect().head
    assert(r.getAs[Long]("o1") * 1000000L == r.getAs[Long]("e1_micro"))
    assert(r.getAs[Long]("chi2_milli") == 0L)
    assert(!r.getAs[Boolean]("reject"))
  }

  test("logrank: hand-computed chi2 on the two-bucket case") {
    // g1 events at d=1 (2 subjects), g2 events at d=2 (2 subjects):
    // E1 = 1e6 micro, V = 333333 micro, chi2 = 3.000 (< 3.8416 -> keep)
    val subj = Seq((1L, 1L, true), (1L, 1L, true), (2L, 1L, false),
      (2L, 1L, false)).toDF("dur", "observed", "g")
    val r = Survival.logRank(subj, "dur", "observed", col("g"))
      .collect().head
    assert(r.getAs[Long]("o1") == 2L)
    assert(r.getAs[Long]("e1_micro") == 1000000L)
    assert(r.getAs[Long]("v_micro") == 333333L)
    assert(r.getAs[Long]("chi2_milli") == 3000L)
    assert(!r.getAs[Boolean]("reject"))
  }

  test("logrank: decisive separation rejects; group sizes count censor-only buckets") {
    // g1: 30 fast events at d=1 plus a censor-only early bucket entry;
    // g2: 30 slow events at d=9 — strongly different curves
    val subj = (Seq((0L, 0L, true)) ++ Seq.fill(30)((1L, 1L, true)) ++
      Seq.fill(30)((9L, 1L, false))).toDF("dur", "observed", "g")
    val r = Survival.logRank(subj, "dur", "observed", col("g"))
      .collect().head
    assert(r.getAs[Long]("n1") == 31L) // censor-only bucket still counted
    assert(r.getAs[Long]("n2") == 30L)
    assert(r.getAs[Boolean]("reject"))
  }

  test("bucket states merge losslessly: split-and-merge == one pass") {
    val subj = Seq((0L, 1L, 1L), (0L, 0L, 2L), (1L, 1L, 3L), (4L, 1L, 4L),
      (4L, 0L, 5L), (9L, 0L, 6L)).toDF("dur", "observed", "u")
    val whole = Survival.nelsonAalen(subj).collect().map(_.toSeq).toList
    val merged = Survival.nelsonAalenFromBuckets(
      Survival.mergeBucketStates(
        Survival.bucketCounts(subj.filter(col("u") % 2 === 0)),
        Survival.bucketCounts(subj.filter(col("u") % 2 === 1))))
      .collect().map(_.toSeq).toList
    assert(merged == whole)
  }

  test("invariant: at_risk is a reverse prefix sum of bucket totals") {
    val subj = Seq((0L, 1L), (0L, 0L), (1L, 1L), (4L, 1L), (4L, 0L), (9L, 0L))
      .toDF("dur", "observed")
    val rows = Survival.nelsonAalen(subj).collect()
    val totals = rows.map(r =>
      r.getAs[Long]("events") + r.getAs[Long]("censored"))
    val expected = totals.scanRight(0L)(_ + _).init
    assert(rows.map(_.getAs[Long]("at_risk")).toList == expected.toList)
  }
}
