package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Conformal, Sampling}

class ConformalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(rows: Seq[(Long, Long, Long)], alphaNum: Int = 1,
      alphaDen: Int = 10) =
    Conformal.coverageReport(
      rows.toDF("k", "y", "y_hat").withColumn("g", lit("all")),
      "k", "y", "y_hat", groupCols = Seq("g"),
      alphaNum = alphaNum, alphaDen = alphaDen, salt = "c")

  test("q_hat is exactly the rank-k calibration order statistic") {
    // deterministic residuals u % 20; recompute the expected order
    // statistic from the REAL split membership, then compare
    val rows = (1L to 1000L).map(u => (u, 100L, 100L - (u % 20)))
    val cal = Sampling.withSplitId((1L to 1000L).toDF("k"), "k",
        Seq(0.5, 0.5), "c").collect()
      .filter(_.getInt(1) == 0).map(_.getLong(0)).toSeq
    val scores = cal.map(_ % 20).sorted
    val k = ((cal.size + 1) * 9 + 9) / 10
    val expected = scores(k - 1) // k is 1-based
    val Array(r) = report(rows).collect()
    assert(r.getAs[Long]("q_hat") == expected)
    assert(r.getAs[Long]("n_cal") == cal.size.toLong)
    assert(r.getAs[Long]("k_rank") == k.toLong)
  }

  test("test-split coverage lands near the 1-alpha target") {
    val rows = (1L to 2000L).map(u => (u, 100L, 100L - (u % 20)))
    val Array(r) = report(rows).collect()
    val pm = r.getAs[Long]("coverage_pm")
    // exchangeable scores: coverage should sit at/above ~90%, and below
    // 100% (the bound is not vacuous on a 20-value score distribution)
    assert(pm >= 8500L && pm < 10000L, s"coverage_pm=$pm")
  }

  test("calibration too small for alpha yields the vacuous infinite bound") {
    // 8 units -> n_cal ≈ 4 < k; q_hat must be MaxValue, coverage total
    val rows = (1L to 8L).map(u => (u, 100L, 90L))
    val Array(r) = report(rows).collect()
    assert(r.getAs[Long]("q_hat") == Long.MaxValue)
    assert(r.getAs[Long]("coverage_pm") == 10000L)
  }

  test("tighter alpha widens the certified interval") {
    val rows = (1L to 2000L).map(u => (u, 100L, 100L - (u % 50)))
    val q10 = report(rows, 1, 10).collect()(0).getAs[Long]("q_hat")
    val q2 = report(rows, 1, 2).collect()(0).getAs[Long]("q_hat")
    assert(q2 <= q10, "median bound must not exceed the 90% bound")
  }
}
