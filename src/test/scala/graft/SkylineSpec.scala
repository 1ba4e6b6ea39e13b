package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frontier(rows: Seq[(Long, Long, Long)]): Set[Long] =
    Skyline.skyline2d(rows.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet

  test("dominated rows drop; same-x lower-y drops; identical pairs both stay") {
    val got = frontier(Seq(
      (1L, 10L, 1L),  // frontier corner (longest)
      (2L, 5L, 5L),   // frontier middle
      (3L, 1L, 9L),   // frontier corner (richest)
      (4L, 4L, 4L),   // dominated by 2
      (5L, 5L, 3L),   // same x as 2, lower y -> dominated
      (6L, 1L, 9L),   // identical to 3 -> no strict dominance, both stay
      (7L, 10L, 1L))) // identical to 1 -> stays
    assert(got == Set(1L, 2L, 3L, 6L, 7L))
  }

  test("agrees with the quadratic dominance definition on a pseudo-random table") {
    val df = spark.range(0, 500)
      .select(col("id"),
        pmod(col("id") * 2654435761L, lit(101L)).as("x"),
        pmod(col("id") * 40503L + 7, lit(97L)).as("y"))
    val fast = Skyline.skyline2d(df, "x", "y").collect().map(_.getLong(0)).toSet
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slow = rows.filter { case (_, bx, by) =>
      !rows.exists { case (_, ax, ay) =>
        ax >= bx && ay >= by && (ax > bx || ay > by)
      }
    }.map(_._1).toSet
    assert(fast == slow)
  }

  test("monotone chain: every row on the frontier") {
    val got = frontier(Seq((1L, 1L, 3L), (2L, 2L, 2L), (3L, 3L, 1L)))
    assert(got == Set(1L, 2L, 3L))
  }
}
