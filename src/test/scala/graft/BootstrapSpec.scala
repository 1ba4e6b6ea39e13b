package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Bootstrap

class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Poisson weights: deterministic, in range, and ~Poisson(1) in the mean") {
    val keys = (1L to 2000L).toDF("k")
    val w = keys.select(Bootstrap.poissonWeight(col("k"), lit(0), "s").as("w"))
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet.forall(k => k >= 0 && k <= 8))
    // mean weight ~= 1 (within 10% at n=2000), and P(0) ~= 1/e
    val mean = w.map { case (k, c) => k * c }.sum.toDouble / 2000
    assert(mean > 0.9 && mean < 1.1, s"mean $mean")
    assert(w(0L) > 600 && w(0L) < 880) // 1/e ~= 0.368
    // determinism: the same draw twice is identical
    val again = keys.select(Bootstrap.poissonWeight(col("k"), lit(0), "s").as("w"))
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w == again)
  }

  test("weights differ across replicates and salts (independent draws)") {
    val keys = (1L to 500L).toDF("k")
    def vec(rep: Int, salt: String) =
      keys.select(Bootstrap.poissonWeight(col("k"), lit(rep), salt).as("w"))
        .collect().map(_.getLong(0)).toSeq
    assert(vec(0, "s") != vec(1, "s"))
    assert(vec(0, "s") != vec(0, "t"))
  }

  test("meanCi: the CI brackets the true mean and the point estimate is exact") {
    val rows = (1L to 400L).map(u => (u, 10L + (u % 21))) // mean = 10 + ~10
    val out = Bootstrap.meanCi(rows.toDF("u", "v"), "u", "v",
      reps = 64, loPm = 25, hiPm = 975, salt = "ci").collect().head
    val exact = rows.map(_._2).sum * 1000000L / 400L
    assert(out.getAs[Long]("n_units") == 400L)
    assert(out.getAs[Long]("b") == 64L)
    assert(out.getAs[Long]("mean_micro") == exact)
    val (lo, hi) = (out.getAs[Long]("ci_lo_micro"), out.getAs[Long]("ci_hi_micro"))
    assert(lo < exact && exact < hi, s"[$lo, $hi] vs $exact")
    // a sane width: sd ~= 6.05, se ~= 0.30 -> half-width ~0.6e6, not 10x off
    assert(hi - lo > 400000L && hi - lo < 3000000L, s"width ${hi - lo}")
  }

  test("meanCi: a constant metric collapses the CI onto the mean") {
    val rows = (1L to 100L).map(u => (u, 7L))
    val out = Bootstrap.meanCi(rows.toDF("u", "v"), "u", "v",
      reps = 16, loPm = 25, hiPm = 975, salt = "c").collect().head
    assert(out.getAs[Long]("mean_micro") == 7000000L)
    assert(out.getAs[Long]("ci_lo_micro") == 7000000L)
    assert(out.getAs[Long]("ci_hi_micro") == 7000000L)
  }

  test("meanCi validates its rank and replicate parameters") {
    val df = Seq((1L, 2L)).toDF("u", "v")
    intercept[IllegalArgumentException](
      Bootstrap.meanCi(df, "u", "v", reps = 2, loPm = 25, hiPm = 975))
    intercept[IllegalArgumentException](
      Bootstrap.meanCi(df, "u", "v", reps = 8, loPm = 975, hiPm = 25))
  }
}
