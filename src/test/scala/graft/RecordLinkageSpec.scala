package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.FieldWeight

class RecordLinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val weights = Seq(
    FieldWeight("name", 9900L, -3000L),
    FieldWeight("seg", 3000L, -1500L),
    FieldWeight("bal", 5000L, -2000L))

  private def link(left: Seq[(Long, Int, String, String, java.lang.Double)],
      right: Seq[(Long, Int, String, String, java.lang.Double)]) =
    RecordLinkage.linkBest(
      left.toDF("id", "blk", "name", "seg", "bal"), "id",
      right.toDF("rid", "blk", "name", "seg", "bal"), "rid",
      blockCols = Seq("blk"), fields = weights,
      upper = 12000L, lower = 0L)

  test("identical records link with full agreement") {
    val r = Seq((1L, 7, "ann", "A", Double.box(10.0)))
    val Array(row) = link(Seq((100L, 7, "ann", "A", Double.box(10.0))), r).collect()
    assert(row.getAs[Long]("cand_rid") == 1L)
    assert(row.getAs[String]("agreement") == "111")
    assert(row.getAs[Long]("score") == 17900L)
    assert(row.getAs[String]("decision") == "match")
  }

  test("one corrupted low-weight field still clears the match threshold") {
    val r = Seq((1L, 7, "ann", "A", Double.box(10.0)))
    val Array(row) = link(Seq((100L, 7, "ann", "B", Double.box(10.0))), r).collect()
    assert(row.getAs[Long]("score") == 9900L - 1500L + 5000L)
    assert(row.getAs[String]("decision") == "match")
  }

  test("a wrong-block record produces no candidate row (blocking is real)") {
    val r = Seq((1L, 7, "ann", "A", Double.box(10.0)))
    assert(link(Seq((100L, 8, "ann", "A", Double.box(10.0))), r).collect().isEmpty)
  }

  test("score ties break on the smallest right key") {
    val r = Seq(
      (9L, 7, "ann", "A", Double.box(10.0)),
      (2L, 7, "ann", "A", Double.box(10.0)))
    val Array(row) = link(Seq((100L, 7, "ann", "A", Double.box(10.0))), r).collect()
    assert(row.getAs[Long]("cand_rid") == 2L)
  }

  test("null-safe comparison: null agrees with null, disagrees with a value") {
    val r = Seq((1L, 7, "ann", "A", null: java.lang.Double))
    val Array(both) = link(Seq((100L, 7, "ann", "A", null: java.lang.Double)), r).collect()
    assert(both.getAs[String]("agreement") == "111")
    val Array(one) = link(Seq((100L, 7, "ann", "A", Double.box(5.0))), r).collect()
    assert(one.getAs[String]("agreement") == "110")
  }

  test("an impostor in the block classifies non-match, not silently matched") {
    val r = Seq((1L, 7, "bob", "B", Double.box(99.0)))
    val Array(row) = link(Seq((100L, 7, "ann", "A", Double.box(10.0))), r).collect()
    assert(row.getAs[Long]("score") == -3000L - 1500L - 2000L)
    assert(row.getAs[String]("decision") == "non_match")
  }

  test("linkBestCapped drops over-cap blocks whole; under-cap blocks link normally") {
    // block 7 holds 3 reference rows (over cap 2) -> dropped entirely;
    // block 8 holds 1 -> links as usual
    val right = (Seq((1L, 7), (2L, 7), (3L, 7), (4L, 8)))
      .map { case (id, b) => (id, b, s"p$id", "A", Double.box(1.0)) }
    val left = Seq(
      (100L, 7, "p1", "A", Double.box(1.0)),   // candidate set capped away
      (200L, 8, "p4", "A", Double.box(1.0)))
    val rows = RecordLinkage.linkBestCapped(
        left.toDF("id", "blk", "name", "seg", "bal"), "id",
        right.toDF("rid", "blk", "name", "seg", "bal"), "rid",
        blockCols = Seq("blk"), fields = weights,
        upper = 12000L, lower = 0L, blockCap = 2)
      .collect()
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(200L))
    assert(rows.head.getAs[Long]("cand_rid") == 4L)
    assert(rows.head.getAs[String]("decision") == "match")
  }

  test("blockCensus reports the cap's recall cost, not just block sizes") {
    val right = (Seq((1L, 7), (2L, 7), (3L, 7), (4L, 8)))
      .map { case (id, b) => (id, b, "x", "A", Double.box(1.0)) }
      .toDF("rid", "blk", "name", "seg", "bal")
    val left = Seq((100L, 7), (101L, 7), (200L, 8))
      .toDF("id", "blk")
    val Array(c) = RecordLinkage.blockCensus(left, right, Seq("blk"), blockCap = 2)
      .collect()
    assert(c.getAs[Long]("block_cap") == 2L)
    assert(c.getAs[Long]("n_blocks") == 2L)
    assert(c.getAs[Long]("max_block") == 3L)
    assert(c.getAs[Long]("over_cap_blocks") == 1L)
    assert(c.getAs[Long]("rows_dropped") == 3L)
    // BOTH left rows in block 7 lose all candidates — the census says so
    assert(c.getAs[Long]("left_affected") == 2L)
  }
}
