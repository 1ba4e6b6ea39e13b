package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Attribution

class AttributionModelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day = 86400000L
  private val look = 7L * day

  private def run(rows: Seq[(Long, Long, String, Long)]) =
    Attribution.modelComparison(
      rows.toDF("user_id", "ms", "event_type", "event_id")
        .withColumn("ts", timestamp_millis(col("ms"))),
      "user_id", "ts", "event_type", "event_id",
      conversionType = "buy", lookbackMs = look)

  test("models: hand-computed three-touch conversion") {
    // touches: view(day1) -> click(day3) -> mail(day6); buy at day7
    val rows = Seq(
      (1L, 1 * day, "view", 1L), (1L, 3 * day, "click", 2L),
      (1L, 6 * day, "mail", 3L), (1L, 7 * day, "buy", 4L))
    val out = run(rows).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
    assert(out("view").getAs[Long]("n_first") == 1L)
    assert(out("mail").getAs[Long]("n_last") == 1L)
    assert(out.values.forall(_.getAs[Long]("linear_micro") == 333333L))
    assert(out("view").getAs[Long]("ushape_micro") == 400000L)
    assert(out("click").getAs[Long]("ushape_micro") == 200000L)
    assert(out("mail").getAs[Long]("ushape_micro") == 400000L)
    // decay favors the most recent touch (age 1d > age 4d > age 6d)
    assert(out("mail").getAs[Long]("decay_micro") >
      out("click").getAs[Long]("decay_micro"))
    assert(out("click").getAs[Long]("decay_micro") >
      out("view").getAs[Long]("decay_micro"))
    // per-conversion decay shares sum to <= 1e6 with truncation slack
    val decaySum = out.values.map(_.getAs[Long]("decay_micro")).sum
    assert(decaySum <= 1000000L && decaySum >= 1000000L - 3L)
  }

  test("models: lookback boundaries — exactly -7d in, at conversion out") {
    val rows = Seq(
      (1L, 0L, "edge", 1L),            // exactly cms - lookback: counted
      (1L, 7 * day, "same", 2L),       // at cms: NOT counted
      (1L, 7 * day, "buy", 3L))
    val out = run(rows).collect()
    assert(out.length == 1 && out.head.getAs[String]("channel") == "edge")
    assert(out.head.getAs[Long]("linear_micro") == 1000000L)
    assert(out.head.getAs[Long]("ushape_micro") == 1000000L) // n = 1
  }

  test("models: cross-bucket pairing (the explode path) and 2-touch U-shape") {
    // conversion just after a bucket boundary sees a touch late in the
    // previous lookback bucket
    val rows = Seq(
      (1L, look - day, "a", 1L), (1L, look + 1000L, "b", 2L),
      (1L, look + day, "buy", 3L))
    val out = run(rows).collect()
      .map(r => r.getAs[String]("channel") -> r).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("a").getAs[Long]("ushape_micro") == 500000L)
    assert(out("b").getAs[Long]("ushape_micro") == 500000L)
    assert(out("a").getAs[Long]("n_first") == 1L)
    assert(out("b").getAs[Long]("n_last") == 1L)
  }
}
