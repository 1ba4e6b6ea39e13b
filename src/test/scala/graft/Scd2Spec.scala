package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, String, String)]) =
    rows.toDF("user", "ms", "plan", "eid")
      .select($"user", timestamp_millis($"ms").as("ts"), $"plan", $"eid")

  test("runs collapse, intervals tile, current row open") {
    val rows = Seq(
      ("u1", 100L, "free", "e1"), ("u1", 200L, "free", "e2"), // re-assertion
      ("u1", 300L, "pro", "e3"), ("u1", 400L, "pro", "e4"),
      ("u1", 500L, "free", "e5"), // back to free = NEW version
      ("u2", 100L, "pro", "e6"))
    val got = Scd2.history(ev(rows), "user", "ts", "plan", "eid")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("u1", "free", 100L, 300L, 1, false),
      ("u1", "pro", 300L, 500L, 2, false),
      ("u1", "free", 500L, -1L, 3, true),
      ("u2", "pro", 100L, -1L, 1, true)))
    // tiling: every non-current valid_to equals the next valid_from
    got.groupBy(_._1).foreach { case (_, vs) =>
      vs.sortBy(_._5).sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3)
        case _ =>
      }
    }
  }

  test("null attribute values are versions too, compared null-safely") {
    val rows = Seq(
      ("u", 1L, null.asInstanceOf[String], "a"), ("u", 2L, null.asInstanceOf[String], "b"),
      ("u", 3L, "x", "c"), ("u", 4L, null.asInstanceOf[String], "d"))
    val got = Scd2.history(ev(rows), "user", "ts", "plan", "eid")
      .orderBy("version").collect()
      .map(r => (Option(r.getString(1)), r.getInt(4)))
    assert(got.toSeq == Seq((None, 1), (Some("x"), 2), (None, 3)))
  }

  test("point-in-time lookup: as-of on valid_from is the interval join") {
    // versions: free@100, pro@300 -> fact at 250 sees free(v1), at 300 pro(v2)
    val dimRows = Seq(("u", 100L, "free", "e1"), ("u", 300L, "pro", "e2"),
      ("u", 300L, "max", "e3")) // same-ms re-change: later tie wins (v3)
    val hist = Scd2.history(ev(dimRows), "user", "ts", "plan", "eid")
    val dim = hist.groupBy($"user_id", $"valid_from_ms".as("ms"))
      .agg(max_by($"attr", $"version").as("plan"), max($"version").as("ver"))
    val facts = Seq(("u", 250L, 1L), ("u", 300L, 2L), ("u", 50L, 3L))
      .toDF("user_id", "ms", "fact_id")
    val got = graft.operators.AsofJoin.asofJoin(facts, dim,
        Seq("user_id"), "ms", Seq("plan", "ver"))
      .collect().map(r => r.getAs[Long]("fact_id") ->
        ((Option(r.getAs[String]("asof_plan")), Option(r.get(4)))))
      .toMap
    assert(got(1L) == ((Some("free"), Some(1))))
    assert(got(2L) == ((Some("max"), Some(3)))) // same-ms collapse: v3 wins
    assert(got(3L) == ((None, None))) // before first version: no leakage
  }

  test("tie column breaks same-millisecond ordering deterministically") {
    val rows = Seq(("u", 5L, "b", "e2"), ("u", 5L, "a", "e1"))
    val got = Scd2.history(ev(rows), "user", "ts", "plan", "eid")
      .orderBy("version").collect().map(_.getString(1))
    assert(got.toSeq == Seq("a", "b")) // e1 before e2
    val re = Scd2.history(ev(rows).repartition(3), "user", "ts", "plan", "eid")
      .orderBy("version").collect().map(_.getString(1))
    assert(re.toSeq == got.toSeq)
  }
}
