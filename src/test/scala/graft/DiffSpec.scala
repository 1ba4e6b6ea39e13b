package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Diff

class DiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val oldDf = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), Some(20.0)),
    (3L, Some("c"), Some(30.0)),
    (4L, None, Some(40.0)),
    (5L, Some("e"), None)).toDF("id", "s", "v")

  private val newDf = Seq(
    (1L, Some("a"), Some(10.0)),   // unchanged -> omitted
    (2L, Some("B"), Some(20.0)),   // s changed
    (4L, Some("d"), Some(41.0)),   // null->value AND value change
    (5L, Some("e"), None),         // null == null -> unchanged
    (6L, Some("f"), Some(60.0)))   // added; 3 removed
    .toDF("id", "s", "v")

  private def run() = Diff.tableDiff(oldDf, newDf, Seq("id")).collect()
    .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap

  test("added / removed / changed with null-safe per-column attribution") {
    val got = run()
    assert(got == Map(
      2L -> (("changed", "s")),
      3L -> (("removed", "")),
      4L -> (("changed", "s,v")),
      6L -> (("added", ""))))
  }

  test("identical tables produce an empty diff") {
    assert(Diff.tableDiff(oldDf, oldDf, Seq("id")).collect().isEmpty)
  }

  test("comparison restricted to common columns; key must exist both sides") {
    // newDf with an extra column: diff ignores it
    val extra = newDf.withColumn("extra", org.apache.spark.sql.functions.lit(1))
    val got = Diff.tableDiff(oldDf, extra, Seq("id")).collect()
    assert(got.length == 4)
    intercept[IllegalArgumentException](
      Diff.tableDiff(oldDf, newDf.drop("v").withColumnRenamed("id", "id2"),
        Seq("id")))
    intercept[IllegalArgumentException](Diff.tableDiff(oldDf, newDf, Nil))
  }

  test("key-only tables: membership changes still reported") {
    val a = Seq(1L, 2L).toDF("id")
    val b = Seq(2L, 3L).toDF("id")
    val got = Diff.tableDiff(a, b, Seq("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "added"))
  }
}
