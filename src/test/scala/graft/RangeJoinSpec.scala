package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 25L), (4L, 99L), (5L, 150L)
  ).toDF("pid", "t")
  private lazy val intervals = Seq(
    (10L, 10L, 30L),  // catches t=10 (start-inclusive), t=25
    (20L, 24L, 25L),  // catches t=25 too (overlap -> two pairs for pid=3)
    (30L, 90L, 99L),  // catches t=99 (end-inclusive), spans bins
    (40L, 200L, 300L) // catches nothing
  ).toDF("iid", "s", "e")

  private def pairs(binSize: Long): Set[(Long, Long)] =
    RangeJoin.rangeJoin(points, "t", intervals, "s", "e", binSize)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("containment with inclusive bounds, overlaps, and no dedup artifacts") {
    val expected = Set((2L, 10L), (3L, 10L), (3L, 20L), (4L, 30L))
    assert(pairs(16L) == expected)
    // result is bin-size invariant (each pair meets in exactly one bin)
    assert(pairs(1L) == expected)
    assert(pairs(1000L) == expected)
  }

  test("degenerate interval fails loudly instead of exploding") {
    val openEnded = Seq((1L, 0L, Long.MaxValue / 2)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.rangeJoin(points, "t", openEnded, "s", "e", binSize = 10).count()
    }
    assert(ex.getMessage.contains("bins") ||
      Option(ex.getCause).exists(_.getMessage.contains("bins")))
    intercept[IllegalArgumentException](
      RangeJoin.rangeJoin(points, "t", intervals, "s", "e", 0))
  }

  test("reversed interval raises instead of exploding a descending sequence") {
    val reversed = Seq((1L, 50L, 10L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.rangeJoin(points, "t", reversed, "s", "e", binSize = 10).count()
    }
    assert(ex.getMessage.contains("bins") ||
      Option(ex.getCause).exists(_.getMessage.contains("bins")))
  }

  test("shared column names across sides are rejected up front") {
    val clash = intervals.withColumnRenamed("iid", "pid")
    intercept[IllegalArgumentException](
      RangeJoin.rangeJoin(points, "t", clash, "s", "e", 10))
  }
}
