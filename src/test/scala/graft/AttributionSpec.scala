package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Attribution

class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("user", "ms", "etype", "eid")
      .select($"user", timestamp_millis($"ms").as("ts"), $"etype", $"eid")

  private def run(rows: Seq[(Long, Long, String, Long)], lookback: Long = 1000L) =
    Attribution.touchAttribution(ev(rows), "user", "ts", "etype", "eid",
        touchType = "click", conversionType = "purchase", lookbackMs = lookback)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long]))))
      .toMap

  test("window bounds: strictly-before, lookback cutoff, zero-touch nulls") {
    val got = run(Seq(
      (1L, 100L, "click", 1L),     // inside window of conv at 500
      (1L, 480L, "click", 2L),     // last touch for conv at 500
      (1L, 500L, "click", 3L),     // SAME ms as conversion -> not credited
      (1L, 500L, "purchase", 10L),
      (2L, 100L, "click", 4L),
      (2L, 2000L, "purchase", 11L), // click at 100 outside 1000ms lookback
      (3L, 700L, "purchase", 12L))) // user with no clicks at all
    assert(got(10L) == ((2L, Some(100L), Some(480L), Some(2L))))
    assert(got(11L) == ((0L, None, None, None)))
    assert(got(12L) == ((0L, None, None, None)))
  }

  test("equal-timestamp touches tie-break to the larger event id") {
    val got = run(Seq(
      (1L, 100L, "click", 7L), (1L, 100L, "click", 9L), (1L, 100L, "click", 8L),
      (1L, 200L, "purchase", 10L)))
    assert(got(10L) == ((3L, Some(100L), Some(100L), Some(9L))))
  }

  test("per-user isolation, multiple conversions, layout invariance") {
    val rows = Seq(
      (1L, 100L, "click", 1L), (2L, 150L, "click", 2L),
      (1L, 200L, "purchase", 10L), (1L, 300L, "click", 3L),
      (1L, 400L, "purchase", 11L), (2L, 500L, "purchase", 12L))
    val got = run(rows)
    assert(got(10L) == ((1L, Some(100L), Some(100L), Some(1L))))
    assert(got(11L) == ((2L, Some(100L), Some(300L), Some(3L))))
    assert(got(12L) == ((1L, Some(150L), Some(150L), Some(2L))))
    val re = Attribution.touchAttribution(ev(rows).repartition(5),
        "user", "ts", "etype", "eid", "click", "purchase", 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(re == got.map { case (k, v) => k -> v._1 })
    intercept[IllegalArgumentException](
      Attribution.touchAttribution(ev(rows), "user", "ts", "etype", "eid",
        "click", "click", 1000L))
  }
}
