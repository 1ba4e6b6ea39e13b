package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{OffPolicy, Sampling}

class OffPolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val users = (1L to 300L).toSeq

  /** k = 3/p for each (user, action) under the operator's own hash. */
  private def kOf(action: String, salt: String): Map[Long, Long] =
    users.toDF("u")
      .select(col("u"), (Sampling.bucket(
        concat(col("u").cast("string"), lit(":" + action)), salt) < 5000).as("lo"))
      .collect().map(r => r.getLong(0) -> (if (r.getBoolean(1)) 12L else 4L)).toMap

  test("single-action vocabulary: estimators match a BigInt hand-replay") {
    val logs = users.map(u => (u, "a", (u % 7).toDouble + 1.0))
      .toDF("user_id", "action", "reward")
    val Array(r) = OffPolicy.ipsReadout(logs, "user_id", "action", "reward",
      actions = Seq("a"), propSalt = "p", targetSalt = "t").collect()
    val ks = kOf("a", "p")
    val num = users.map(u => BigInt(((u % 7) + 1) * ks(u) * 100)).sum
    val sumK = users.map(ks).sum
    val sumK2 = users.map(u => ks(u) * ks(u)).sum
    val n = users.size.toLong
    assert(r.getAs[Long]("n") == n && r.getAs[Long]("n_matched") == n)
    assert(r.getAs[Long]("sum_k") == sumK)
    assert(BigInt(r.getAs[Long]("ips_milli")) == num * 10 / (3 * n))
    assert(BigInt(r.getAs[Long]("snips_milli")) == num * 10 / sumK)
    assert(BigInt(r.getAs[Long]("ess_pm")) ==
      BigInt(sumK) * sumK * 10000 / (n * sumK2))
  }

  test("equal propensities make SNIPS the exact mean reward") {
    // one user -> one k for its (user, action); constant reward 5.0
    val logs = Seq.fill(40)((7L, "a", 5.0)).toDF("user_id", "action", "reward")
    val Array(r) = OffPolicy.ipsReadout(logs, "user_id", "action", "reward",
      actions = Seq("a"), propSalt = "p", targetSalt = "t").collect()
    assert(r.getAs[Long]("snips_milli") == 5000L) // mean = 5.000
    assert(r.getAs[Long]("ess_pm") == 10000L)     // equal weights: full ESS
  }

  test("logged actions the target never picks contribute n but no weight") {
    val logs = users.map(u => (u, "offvocab", 3.0))
      .toDF("user_id", "action", "reward")
    val out = OffPolicy.ipsReadout(logs, "user_id", "action", "reward",
      actions = Seq("a", "b"), propSalt = "p", targetSalt = "t").collect()
    assert(out.map(_.getAs[Long]("n")).sum == users.size.toLong)
    out.foreach { r =>
      assert(r.getAs[Long]("n_matched") == 0L)
      assert(r.getAs[Long]("ips_milli") == 0L)
      assert(r.getAs[Long]("snips_milli") == 0L)
      assert(r.getAs[Long]("ess_pm") == 0L)
    }
  }

  test("target policy is a deterministic partition of contexts") {
    val logs = users.map(u => (u, "a", 1.0)).toDF("user_id", "action", "reward")
    val out = OffPolicy.ipsReadout(logs, "user_id", "action", "reward",
      actions = Seq("a", "b", "c"), propSalt = "p", targetSalt = "t").collect()
    // every context lands on exactly one target; totals add up
    assert(out.map(_.getAs[Long]("n")).sum == users.size.toLong)
    assert(out.map(_.getAs[String]("target_action")).toSet.subsetOf(Set("a", "b", "c")))
    // only the 'a' slice can match logs that are all action 'a'
    out.filter(_.getAs[String]("target_action") != "a")
      .foreach(r => assert(r.getAs[Long]("n_matched") == 0L))
  }
}
