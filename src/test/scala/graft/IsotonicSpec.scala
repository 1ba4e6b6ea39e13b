package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Isotonic

class IsotonicSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fit(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    import spark.implicits._
    Isotonic.isotonicBins(rows.toDF("b", "n", "pos"), "b", "n", "pos")
      .select(col("bin"), col("iso_rate_micro"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
  }

  test("already-monotone input is returned unchanged") {
    val r = fit(Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L)))
    assert(r === Seq((0L, 100000L), (1L, 500000L), (2L, 900000L)))
  }

  test("a violating adjacent pair is pooled to its joint rate") {
    // rates 0.8 then 0.2 -> pooled to (8+2)/20 = 0.5 on both bins
    val r = fit(Seq((0L, 10L, 8L), (1L, 10L, 2L)))
    assert(r === Seq((0L, 500000L), (1L, 500000L)))
  }

  test("classic PAVA example: pooling cascades left") {
    // rates 0.1, 0.9, 0.5, 0.3 -> bins 1..3 pool to (9+5+3)/30
    val r = fit(Seq((0L, 10L, 1L), (1L, 10L, 9L), (2L, 10L, 5L), (3L, 10L, 3L)))
    assert(r === Seq((0L, 100000L), (1L, 566666L), (2L, 566666L), (3L, 566666L)))
  }

  test("output is always monotone non-decreasing, weights respected") {
    // heavier right bin drags the pool toward its own rate
    val r = fit(Seq((0L, 1L, 1L), (1L, 99L, 0L), (2L, 10L, 10L)))
    val iso = r.map(_._2)
    assert(iso === iso.sorted)
    // pooled first block: (1+0)/100 = 0.01
    assert(r.head._2 === 10000L)
  }
}
