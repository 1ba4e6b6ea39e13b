package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Experiment

class PowerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("power: hand-computed MDE and n-needed at p=0.5, 8 users") {
    // 8 users, 4 converted: p_pm = 5000, n_arm = 4
    // MDE = 2.8016*sqrt(2*.25/4) = 0.99057 -> 9905 pm (floor semantics)
    // n_need@2%rel: delta_pm=100, ceil(3.92448128e16/1e12) = 39245
    val df = (1L to 8L).map(u => (u, "m", if (u <= 4) 20.0 else 1.0))
      .toDF("user_id", "event_type", "value")
    val r = Experiment.powerReadout(df, "user_id", "event_type",
      col("value") >= 15, relPm = Seq(200L)).collect().head
    assert(r.getAs[Long]("p_pm") == 5000L)
    assert(r.getAs[Long]("n_arm") == 4L)
    assert(r.getAs[Long]("mde_pm") == 9905L)
    assert(r.getAs[Long]("n_need_rel200") == 39245L)
  }

  test("power: more users shrink the MDE; smaller target lift needs more n") {
    val small = (1L to 40L).map(u => (u, "m", if (u % 4 == 0) 20.0 else 1.0))
    val large = (1L to 4000L).map(u => (u, "m", if (u % 4 == 0) 20.0 else 1.0))
    def readout(rows: Seq[(Long, String, Double)]) =
      Experiment.powerReadout(rows.toDF("user_id", "event_type", "value"),
        "user_id", "event_type", col("value") >= 15).collect().head
    val (s, l) = (readout(small), readout(large))
    assert(s.getAs[Long]("p_pm") == l.getAs[Long]("p_pm"))
    assert(l.getAs[Long]("mde_pm") < s.getAs[Long]("mde_pm"))
    assert(l.getAs[Long]("n_need_rel200") > l.getAs[Long]("n_need_rel500"))
  }

  test("power: zero conversions yield NULL design numbers, not a crash") {
    val df = (1L to 10L).map(u => (u, "m", 1.0))
      .toDF("user_id", "event_type", "value")
    val r = Experiment.powerReadout(df, "user_id", "event_type",
      col("value") >= 15).collect().head
    assert(r.getAs[Long]("conv_users") == 0L)
    assert(r.isNullAt(r.fieldIndex("mde_pm")))
    assert(r.isNullAt(r.fieldIndex("n_need_rel200")))
  }

  test("aa calibration: cell grid is salts x metrics with a consistent summary") {
    val rows = (1L to 120L).flatMap(u => Seq(
      (u, "m1", 20.0), (u, "m2", if (u % 3 == 0) 20.0 else 1.0)))
    val df = rows.toDF("user_id", "event_type", "value")
    val out = Experiment.aaCalibration(df, "user_id", "event_type",
      converted = col("metric_value") >= 20,
      perUserAgg = max(col("value")),
      salts = Seq("s1", "s2", "s3")).collect()
    assert(out.length == 6) // 3 salts x 2 metrics
    assert(out.forall(_.getAs[Long]("n_tests") == 6L))
    val fp = out.head.getAs[Long]("n_false_pos")
    assert(fp == out.count(_.getAs[Boolean]("significant")).toLong)
    assert(out.head.getAs[Long]("fp_pm") == (10000L * fp) / 6L)
    // arms always partition the full user ledger
    assert(out.forall(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 120L))
  }

  test("aa calibration: identical salts give identical verdicts (determinism)") {
    val rows = (1L to 60L).map(u => (u, "m", if (u % 2 == 0) 20.0 else 1.0))
    val df = rows.toDF("user_id", "event_type", "value")
    def run() = Experiment.aaCalibration(df, "user_id", "event_type",
      converted = col("metric_value") >= 20, perUserAgg = max(col("value")),
      salts = Seq("x", "y")).collect().map(_.toSeq)
    assert(run().toList == run().toList)
  }

  test("power: a user with any converting row counts once") {
    val df = Seq((1L, "m", 20.0), (1L, "m", 20.0), (1L, "m", 1.0),
      (2L, "m", 1.0)).toDF("user_id", "event_type", "value")
    val r = Experiment.powerReadout(df, "user_id", "event_type",
      col("value") >= 15).collect().head
    assert(r.getAs[Long]("n_users") == 2L)
    assert(r.getAs[Long]("conv_users") == 1L)
    assert(r.getAs[Long]("p_pm") == 5000L)
  }
}
