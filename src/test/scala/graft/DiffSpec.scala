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

  private val master = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "amt")
  private val detail = Seq((1L, 60L), (1L, 40L), (2L, 150L), (4L, 70L))
    .toDF("k", "amt")

  private def rec(tol: Long) = Diff.reconcile(master, detail, Seq("k"),
      org.apache.spark.sql.functions.col("amt"),
      org.apache.spark.sql.functions.sum($"amt"), tol)
    .collect()
    .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
      Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3), r.getString(4))))
    .toMap

  test("reconcile: mismatch, missing sides, reconciled keys omitted") {
    val got = rec(0L)
    // key 1 reconciles (60+40 = 100) and is omitted
    assert(got == Map(
      2L -> ((Some(200L), Some(150L), 50L, "mismatch")),
      3L -> ((Some(300L), None, 300L, "missing_detail")),
      4L -> ((None, Some(70L), -70L, "missing_master"))))
  }

  test("reconcile: tolerance silences small mismatches, never missing sides") {
    val got = rec(50L)
    assert(!got.contains(2L)) // |50| <= 50 tolerated
    assert(got.contains(3L) && got.contains(4L)) // missing always reported
    assert(rec(49L).contains(2L))
  }

  test("reconcile guards: keys and tolerance") {
    intercept[IllegalArgumentException](Diff.reconcile(master, detail, Nil,
      $"amt", org.apache.spark.sql.functions.sum($"amt")))
    intercept[IllegalArgumentException](Diff.reconcile(master, detail,
      Seq("k"), $"amt", org.apache.spark.sql.functions.sum($"amt"), -1L))
  }

  test("key-only tables: membership changes still reported") {
    val a = Seq(1L, 2L).toDF("id")
    val b = Seq(2L, 3L).toDF("id")
    val got = Diff.tableDiff(a, b, Seq("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "added"))
  }
}
