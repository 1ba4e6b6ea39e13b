package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

class KsDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ks(rows: Seq[(String, Double, Int)]) =
    Drift.ksTwoSample(rows.toDF("k", "v", "a"), "k", "v", col("a") === 1)

  test("ks: identical samples give D = 0 and no rejection") {
    val rows = Seq(1.0, 2.0, 3.0).flatMap(v => Seq(("k", v, 1), ("k", v, 0)))
    val r = ks(rows).collect().head
    assert(r.getAs[Long]("d_pm") == 0L)
    assert(!r.getAs[Boolean]("reject"))
  }

  test("ks: disjoint supports give D = 1, but 3-vs-3 cannot reject") {
    val rows = Seq(("k", 1.0, 1), ("k", 1.0, 1), ("k", 2.0, 1),
      ("k", 5.0, 0), ("k", 5.0, 0), ("k", 6.0, 0))
    val r = ks(rows).collect().head
    assert(r.getAs[Long]("d_pm") == 10000L)
    // critical D at n=3,3 is 1.358*sqrt(6/9) = 1.109 > 1 — undetectable
    assert(!r.getAs[Boolean]("reject"))
  }

  test("ks: disjoint supports at 30-vs-30 reject decisively") {
    val rows = (1 to 30).map(i => ("k", i.toDouble, 1)) ++
      (1 to 30).map(i => ("k", 100.0 + i, 0))
    val r = ks(rows).collect().head
    assert(r.getAs[Long]("d_pm") == 10000L)
    assert(r.getAs[Boolean]("reject"))
  }

  test("ks: hand-computed D for a partial shift") {
    // A = {1,2,3,4}, B = {3,4,5,6}: max gap at v=2 -> |4*2 - 4*0| = 8
    // D = 8/16 = 0.5 -> 5000 pm
    val rows = Seq(1.0, 2.0, 3.0, 4.0).map(("k", _, 1)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map(("k", _, 0))
    val r = ks(rows).collect().head
    assert(r.getAs[Long]("d_pm") == 5000L)
  }

  test("ks: keys are tested independently") {
    val rows = Seq(1.0, 2.0).flatMap(v => Seq(("same", v, 1), ("same", v, 0))) ++
      (Seq(("shift", 1.0, 1), ("shift", 9.0, 0)))
    val out = ks(rows).collect().map(r =>
      r.getAs[String]("key") -> r.getAs[Long]("d_pm")).toMap
    assert(out("same") == 0L)
    assert(out("shift") == 10000L)
  }
}
