package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Hll

class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("estimate within sketch error of the truth; small range near-exact") {
    // 10k distinct values in one segment: expect ~1.04/sqrt(256) = 6.5% error
    val big = (0L until 10000L).map(i => ("s", i)).toDF("seg", "v")
    val est = Hll.distinctEstimate(big, "v", "seg", p = 8)
      .filter($"segment" === "s").head()
    assert(est.getLong(2) == 10000L)
    val rel = math.abs(est.getLong(1) - 10000.0) / 10000.0
    assert(rel < 0.2, s"estimate ${est.getLong(1)} off by $rel")
    // 30 distinct: linear-counting branch, error at most a few counts
    val small = (0L until 30L).map(i => ("t", i)).toDF("seg", "v")
    val se = Hll.distinctEstimate(small, "v", "seg", p = 8)
      .filter($"segment" === "t").head()
    assert(math.abs(se.getLong(1) - 30L) <= 2, s"got ${se.getLong(1)}")
  }

  test("merged __all__ row equals the sketch of the union stream") {
    // overlapping segments: union is NOT the sum of parts
    val rows = ((0L until 500L).map(i => ("a", i)) ++
      (250L until 750L).map(i => ("b", i))).toDF("seg", "v")
    val all = Hll.distinctEstimate(rows, "v", "seg", p = 8)
      .filter($"segment" === "__all__").head()
    val one = Hll.distinctEstimate(rows.withColumn("seg", lit("x")), "v", "seg", p = 8)
      .filter($"segment" === "x").head()
    assert(all.getLong(1) == one.getLong(1), "register max-merge must equal union sketch")
    assert(all.getLong(2) == 750L)
  }

  test("duplicates don't move registers; layout-invariant") {
    val base = (0L until 1000L).map(i => ("s", i % 200)).toDF("seg", "v")
    val a = Hll.distinctEstimate(base, "v", "seg", 8).head().getLong(1)
    val b = Hll.distinctEstimate(base.repartition(7), "v", "seg", 8).head().getLong(1)
    val c = Hll.distinctEstimate(
      (0L until 200L).map(i => ("s", i)).toDF("seg", "v"), "v", "seg", 8)
      .head().getLong(1)
    assert(a == b && a == c)
    intercept[IllegalArgumentException](Hll.registers(base, "v", "seg", 2))
  }
}
