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

  test("countingQuantiles: type-1 ceil-rank selection, hand case on 1..10") {
    val df = (1L to 10L).map(("a", "d1", _)) ++ Seq(("a", "d2", 7L))
    val out = CountingQuantile.countingQuantiles(df.toDF("s", "d", "x"),
      Seq("s", "d"), "x",
      Seq(("p50", 5000L), ("p90", 9000L), ("p99", 9900L))).collect()
      .map(r => r.getAs[String]("d") -> r).toMap
    val d1 = out("d1")
    assert(d1.getAs[Long]("n") == 10L)
    assert(d1.getAs[Long]("p50") == 5L)  // rank ceil(5) = 5
    assert(d1.getAs[Long]("p90") == 9L)  // rank 9
    assert(d1.getAs[Long]("p99") == 10L) // rank ceil(9.9) = 10
    // a single-value group answers every quantile with that value
    val d2 = out("d2")
    assert(d2.getAs[Long]("p50") == 7L && d2.getAs[Long]("p99") == 7L)
  }

  test("countingQuantiles: quantiles are monotone and within [min, max]") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(300)(("g", "d", (rnd.nextInt(50) + 1).toLong))
      .toDF("s", "d", "x")
    val r = CountingQuantile.countingQuantiles(df, Seq("s", "d"), "x",
      Seq(("p50", 5000L), ("p90", 9000L), ("p99", 9900L))).collect().head
    assert(r.getAs[Long]("p50") <= r.getAs[Long]("p90"))
    assert(r.getAs[Long]("p90") <= r.getAs[Long]("p99"))
  }
}
