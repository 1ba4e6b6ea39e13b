package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.CountingQuantile

class CountingQuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("odd and even group sizes; duplicates; single-value group") {
    val df = Seq(
      ("a", 1), ("a", 3), ("a", 9),             // odd -> 3
      ("b", 1), ("b", 2), ("b", 10), ("b", 11), // even -> (2+10)/2 = 6
      ("c", 5), ("c", 5), ("c", 5), ("c", 5),   // all equal -> 5
      ("d", 7)                                  // singleton -> 7
    ).toDF("g", "x")
    val got = CountingQuantile.countingMedian(df, "g", "x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("a", 3L, 3L, 1.0, 9.0, 3.0),
      ("b", 4L, 4L, 1.0, 11.0, 6.0),
      ("c", 4L, 1L, 5.0, 5.0, 5.0),
      ("d", 1L, 1L, 7.0, 7.0, 7.0)))
  }

  test("agrees with exact percentile(0.5) on a deterministic pseudo-random table") {
    // xorshift-ish values from the row index: deterministic, no RNG APIs
    val df = spark.range(0, 2000)
      .select((col("id") % 7).cast("string").as("g"),
        (pmod(col("id") * 2654435761L, lit(97L))).as("x"))
    val viaCounts = CountingQuantile.countingMedian(df, "g", "x")
      .select("g", "median").as[(String, Double)].collect().toMap
    val viaSort = df.groupBy("g")
      .agg(percentile(col("x"), lit(0.5)).as("p50"))
      .as[(String, Double)].collect().toMap
    assert(viaCounts.keySet == viaSort.keySet)
    viaCounts.foreach { case (g, m) =>
      assert(m == viaSort(g), s"group $g: counting $m vs sort ${viaSort(g)}")
    }
  }

  test("nulls in the value column are ignored") {
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(3))).toDF("g", "x")
    val got = CountingQuantile.countingMedian(df, "g", "x").collect()(0)
    assert(got.getLong(1) == 2L && got.getDouble(5) == 2.0)
  }
}
