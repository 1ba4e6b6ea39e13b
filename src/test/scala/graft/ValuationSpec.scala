package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Valuation

class ValuationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("leave-one-out: helping and hurting groups get opposite signs") {
    // g1 = {10, 20} drags the mean down; g2 = {40} pulls it up
    val out = Valuation.leaveOneOut(
      Seq(("g1", 10L), ("g1", 20L), ("g2", 40L)).toDF("g", "v"), "g", "v")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("g1").getAs[Long]("mean_micro") == 15000000L)
    assert(out("g1").getAs[Long]("loo_mean_micro") == 40000000L)
    assert(out("g1").getAs[Long]("contribution_micro") == 23333333L - 40000000L)
    assert(out("g2").getAs[Long]("loo_mean_micro") == 15000000L)
    assert(out("g2").getAs[Long]("contribution_micro") == 23333333L - 15000000L)
    assert(out("g1").getAs[Long]("global_mean_micro") == 23333333L)
    assert(out("g1").getAs[Long]("share_pm") == 666L)
  }

  test("leave-one-out: a group covering the whole input has no complement") {
    val out = Valuation.leaveOneOut(
      Seq(("only", 5L), ("only", 7L)).toDF("g", "v"), "g", "v").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("loo_mean_micro")))
    assert(out.head.isNullAt(out.head.fieldIndex("contribution_micro")))
    assert(out.head.getAs[Long]("mean_micro") == 6000000L)
  }

  test("leave-one-out: contributions are consistent (sum of n*contrib telescopes)") {
    // exact identity modulo per-group truncation: each contribution is
    // within 1 micro of (n_g/(N-n_g))*(mean_g - global_mean)
    val df = Seq(("a", 1L), ("a", 3L), ("b", 10L), ("c", 2L), ("c", 4L), ("c", 6L))
      .toDF("g", "v")
    val out = Valuation.leaveOneOut(df, "g", "v").collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n"); val nn = 6L
      val exact = (r.getAs[Long]("mean_micro") - r.getAs[Long]("global_mean_micro")).toDouble *
        n / (nn - n)
      assert(math.abs(r.getAs[Long]("contribution_micro") - exact) <= 2.0)
    }
  }
}
