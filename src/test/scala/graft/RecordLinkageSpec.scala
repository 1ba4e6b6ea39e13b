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
}
