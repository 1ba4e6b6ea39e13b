package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Paths

class PathsBacktestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("user_id", "ms", "event_type", "event_id")
      .withColumn("ts", timestamp_millis(col("ms")))

  private val day = 86400000L

  test("backtest: argmax trains on early days, scores on late days") {
    // train (day 0): a->b, a->b, a->c  => pred(a)=b (2 votes)
    // eval (day 2): a->b hit, a->c miss
    val df = ev(Seq(
      (1L, 1000L, "a", 1L), (1L, 2000L, "b", 2L), (1L, 3000L, "a", 3L),
      (1L, 4000L, "b", 4L), (1L, 5000L, "a", 5L), (1L, 6000L, "c", 6L),
      (2L, 2 * day + 1000L, "a", 7L), (2L, 2 * day + 2000L, "b", 8L),
      (3L, 2 * day + 1000L, "a", 9L), (3L, 2 * day + 2000L, "c", 10L)
    ))
    val out = Paths.transitionBacktest(df, "user_id", "ts", "event_type",
      "event_id", trainDays = 1L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("from_type") == "a")
    assert(r.getAs[String]("pred_type") == "b")
    assert(r.getAs[Long]("n_train") == 2L)
    assert(r.getAs[Long]("hits") == 1L)
    assert(r.getAs[Long]("total") == 2L)
    assert(r.getAs[Long]("acc_pm") == 5000L)
  }

  test("backtest: training ties resolve to the alphabetically-least successor") {
    val df = ev(Seq(
      (1L, 1000L, "x", 1L), (1L, 2000L, "b", 2L),
      (2L, 1000L, "x", 3L), (2L, 2000L, "a", 4L),
      (3L, day + 1000L, "x", 5L), (3L, day + 2000L, "a", 6L)
    ))
    val out = Paths.transitionBacktest(df, "user_id", "ts", "event_type",
      "event_id", trainDays = 1L).collect().head
    assert(out.getAs[String]("pred_type") == "a") // 1-1 tie, min wins
    assert(out.getAs[Long]("acc_pm") == 10000L)
  }

  test("backtest: eval-only from-types keep NULL prediction and zero hits") {
    val df = ev(Seq(
      (1L, 1000L, "a", 1L), (1L, 2000L, "b", 2L),
      (2L, day + 1000L, "z", 3L), (2L, day + 2000L, "a", 4L)
    ))
    val out = Paths.transitionBacktest(df, "user_id", "ts", "event_type",
      "event_id", trainDays = 1L).collect()
    val z = out.find(_.getAs[String]("from_type") == "z").get
    assert(z.isNullAt(z.fieldIndex("pred_type")))
    assert(z.getAs[Long]("hits") == 0L)
    assert(z.getAs[Long]("acc_pm") == 0L)
  }

  test("stationary: a symmetric two-state oscillator stays uniform") {
    // a->b and b->a only: P is the swap matrix; uniform is stationary
    val df = ev(Seq((1L, 1000L, "a", 1L), (1L, 2000L, "b", 2L),
      (1L, 3000L, "a", 3L), (1L, 4000L, "b", 4L)))
    val out = Paths.stationaryDistribution(df, "user_id", "ts",
      "event_type", "event_id", iterations = 8).collect()
      .map(r => r.getAs[String]("state") -> r.getAs[Long]("pi_micro")).toMap
    assert(out == Map("a" -> 500000L, "b" -> 500000L))
  }

  test("stationary: mass drains into a dangling state's self-loop") {
    // a->b twice, b never leaves (dangling) -> all mass ends at b
    val df = ev(Seq((1L, 1000L, "a", 1L), (1L, 2000L, "b", 2L),
      (2L, 1000L, "a", 3L), (2L, 2000L, "b", 4L)))
    val out = Paths.stationaryDistribution(df, "user_id", "ts",
      "event_type", "event_id", iterations = 16).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("state") == "b")
    // started uniform (500000 each); a's share moved to b un-truncated
    assert(out.head.getAs[Long]("pi_micro") == 1000000L)
  }

  test("backtest: the session gap stops pairs crossing a 30-minute hole") {
    // same eval day, but the two events are 31 minutes apart — no pair,
    // so the eval side is empty and no row survives
    val df = ev(Seq(
      (1L, 1000L, "a", 1L), (1L, 2000L, "b", 2L),
      (2L, day + 1000L, "a", 3L), (2L, day + 1000L + 31 * 60000L, "b", 4L)
    ))
    val out = Paths.transitionBacktest(df, "user_id", "ts", "event_type",
      "event_id", trainDays = 1L).collect()
    assert(out.isEmpty)
  }
}
