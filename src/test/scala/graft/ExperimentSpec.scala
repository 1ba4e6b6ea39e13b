package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Experiment, Sampling}

class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The md5 arm of each user under `salt`, read off the same assignment
    * the operator uses — tests engineer conversion AGAINST the real
    * assignment instead of assuming who lands where. */
  private def armsOf(users: Seq[Long], salt: String): Map[Long, Int] =
    Sampling.withSplitId(users.toDF("u"), "u", Seq(0.5, 0.5), salt, "variant")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private val users = (1L to 200L).toSeq
  private val arms = armsOf(users, "t")

  test("total separation between arms is significant; rates are exact per-myriad") {
    // every arm-0 user converts (15 rows), every arm-1 user doesn't (1 row)
    val events = users.flatMap { u =>
      val n = if (arms(u) == 0) 15 else 1
      Seq.fill(n)((u, "m"))
    }.toDF("user_id", "mtype")
    val Array(r) = Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 15, salt = "t").collect()
    val (nA, cA, nB, cB) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nA + nB == 200L)
    assert(cA == nA && cB == 0L)
    assert(r.getLong(5) == 10000L && r.getLong(6) == 0L)
    assert(r.getBoolean(7))
  }

  test("universal conversion: a = 0, verdict not significant") {
    val events = users.flatMap(u => Seq.fill(2)((u, "m"))).toDF("user_id", "mtype")
    val Array(r) = Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 2, salt = "t").collect()
    assert(r.getLong(2) == r.getLong(1) && r.getLong(4) == r.getLong(3))
    assert(!r.getBoolean(7))
  }

  test("zero converters: the metric vanishes from the report") {
    val events = users.map(u => (u, "m")).toDF("user_id", "mtype")
    assert(Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 99, salt = "t").collect().isEmpty)
  }

  test("custom per-user aggregate feeds the conversion predicate") {
    // conversion on the SUM of value, not the row count
    val events = users.flatMap { u =>
      val v = if (arms(u) == 0) 30.0 else 1.0
      Seq((u, "m", v))
    }.toDF("user_id", "mtype", "value")
    val Array(r) = Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 30.0,
      perUserAgg = sum(col("value")), salt = "t").collect()
    assert(r.getLong(2) == r.getLong(1) && r.getLong(4) == 0L)
    assert(r.getBoolean(7))
  }

  test("readout is deterministic across recomputes") {
    val events = users.flatMap(u => Seq.fill((u % 20).toInt + 1)((u, "m")))
      .toDF("user_id", "mtype")
    val mk = () => Experiment.abReadout(events, "user_id", "mtype",
      converted = col("metric_value") >= 10, salt = "t").collect().toSeq
    assert(mk() == mk())
  }
}
