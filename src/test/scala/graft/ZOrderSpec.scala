package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference bit-by-bit interleave. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 32).foldLeft(0L) { (z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zValue matches the bit-by-bit reference on a sweep of inputs") {
    val cases = for {
      x <- Seq(0L, 1L, 2L, 3L, 7L, 100L, 65535L, 65536L, 2000000000L)
      y <- Seq(0L, 1L, 5L, 99L, 4095L, 1999L, 123456789L)
    } yield (x, y)
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y), s"($x,$y)")
    }
  }

  test("spreadSql replays spreadBits exactly") {
    val vals = Seq(0L, 1L, 42L, 65535L, 4294967295L)
    val scala = vals.toDF("v").select(ZOrder.spreadBits(col("v")))
      .collect().map(_.getLong(0)).toSeq
    val sql = vals.toDF("v").selectExpr(ZOrder.spreadSql("v") + " AS s")
      .collect().map(_.getLong(0)).toSeq
    assert(scala == sql)
  }

  test("clusterStats: equal-count files covering all rows, boxes consistent") {
    val rows = for (x <- 0L until 32L; y <- 0L until 8L) yield (x, y, x * 8 + y)
    val df = rows.toDF("x", "y", "id")
    val st = ZOrder.clusterStats(df, "x", "y", nFiles = 16, tieCols = Seq("id"))
      .orderBy("file_id").collect()
    assert(st.length == 16)
    assert(st.map(_.getAs[Long]("n_rows")).forall(_ == 16)) // 256/16
    st.foreach { r =>
      assert(r.getAs[Long]("min_x") <= r.getAs[Long]("max_x"))
      assert(r.getAs[Long]("min_y") <= r.getAs[Long]("max_y"))
    }
  }

  test("z-order boxes prune on BOTH axes where an x-sort only prunes on x") {
    // 64x64 grid; predicate selects a thin y-slice. Under z-order most
    // files' y-boxes miss it; under x-major sort every file spans all y.
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y, x * 64 + y)
    val df = rows.toDF("x", "y", "id")
    val zScan = ZOrder.clusterStats(df, "x", "y", nFiles = 64, tieCols = Seq("id"))
      .withColumn("ws", ZOrder.wouldScan(0, 63, 10, 11))
      .filter(col("ws")).count()
    // ORDER BY x layout: same rank-bucket file assignment, x-major order.
    val xFiles = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("x", "y", "id")))
      .withColumn("file_id", expr("CAST(((rn - 1) * 64) DIV 4096 AS BIGINT)"))
      .groupBy("file_id")
      .agg(min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
    val xScan = xFiles.withColumn("ws", ZOrder.wouldScan(0, 63, 10, 11))
      .filter(col("ws")).count()
    assert(zScan < 24, s"z-order should prune most of 64 files, scanned $zScan")
    assert(xScan == 64L, "an x-only sort cannot prune a y-predicate")
  }

  test("wouldScan is the exact box-intersection rule") {
    val st = Seq((0L, 5L, 10L, 0L, 5L), (1L, 6L, 10L, 6L, 9L)).toDF(
      "file_id", "min_x", "max_x", "min_y", "max_y")
    val got = st.withColumn("ws", ZOrder.wouldScan(0, 100, 0, 5))
      .orderBy("file_id").collect().map(_.getAs[Boolean]("ws")).toSeq
    assert(got == Seq(true, false))
  }
}
