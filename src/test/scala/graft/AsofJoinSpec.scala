package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val quotes = Seq( // key, time, px
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)
  ).toDF("sym", "t", "px")

  private lazy val trades = Seq( // key, time, qty
    ("A", 5L, 100L),  // before any quote -> null
    ("A", 20L, 200L), // equal time -> that quote (≤ semantics)
    ("A", 25L, 300L), // between -> t=20 quote
    ("A", 99L, 400L), // after all -> t=30 quote
    ("B", 16L, 500L), // B's own quote, not A's
    ("C", 50L, 600L)  // key with no quotes at all -> null
  ).toDF("sym", "t", "qty")

  test("most recent right row at-or-before each left row, per key") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", Seq("px"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out == Map(
      ("A", 5L) -> None, ("A", 20L) -> Some(2.0), ("A", 25L) -> Some(2.0),
      ("A", 99L) -> Some(3.0), ("B", 16L) -> Some(9.0), ("C", 50L) -> None))
  }

  test("left columns ride through; multiple payload columns stay row-atomic") {
    val q2 = quotes.withColumn("venue", concat($"sym", $"t"))
    val out = AsofJoin.asofJoin(trades, q2, Seq("sym"), "t", Seq("px", "venue"))
      .filter($"qty" === 300L).head()
    assert(out.getAs[Long]("qty") == 300L)
    assert(out.getAs[Double]("asof_px") == 2.0)
    assert(out.getAs[String]("asof_venue") == "A20") // same row as the px
  }

  test("reserved column names are rejected") {
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      trades.withColumn("__side", $"qty"), quotes, Seq("sym"), "t", Seq("px")))
    // a left column that would collide with a prefixed output
    intercept[IllegalArgumentException](AsofJoin.asofJoin(
      trades.withColumn("asof_px", $"qty"), quotes, Seq("sym"), "t", Seq("px")))
  }

  test("null keys never match, matching equi-join / DuckDB ASOF semantics") {
    val l = Seq((Option.empty[String], 10L, 1L), (Some("A"), 25L, 2L))
      .toDF("sym", "t", "qty")
    val r = Seq((Option.empty[String], 5L, 7.7), (Some("A"), 20L, 2.0))
      .toDF("sym", "t", "px")
    val out = AsofJoin.asofJoin(l, r, Seq("sym"), "t", Seq("px"))
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(2.0))) // null-key left row carries nothing
  }

  test("null times never match: null-time right rows are not carried, null-time left rows get null payload") {
    val l = Seq(
      (Some("A"), Some(5L), 1L),   // before every real quote -> null (NOT the null-time quote)
      (Some("A"), Some(25L), 2L),  // -> t=20 quote
      (Some("A"), Option.empty[Long], 3L) // null left time matches nothing
    ).toDF("sym", "t", "qty")
    val r = Seq(
      (Some("A"), Option.empty[Long], 66.6), // null right time: sorts first under asc, must be ignored
      (Some("A"), Some(20L), 2.0)
    ).toDF("sym", "t", "px")
    val out = AsofJoin.asofJoin(l, r, Seq("sym"), "t", Seq("px"))
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    assert(out == Map(1L -> None, 2L -> Some(2.0), 3L -> None))
  }
}
