package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(String, Long, String, Long)]) =
    rows.toDF("user", "ms", "plan", "eid")
      .select($"user", timestamp_millis($"ms").as("ts"), $"plan", $"eid")

  test("runs collapse, intervals tile, current row open") {
    val rows = Seq(
      ("u1", 100L, "free", 10L), ("u1", 200L, "free", 20L), // re-assertion
      ("u1", 300L, "pro", 30L), ("u1", 400L, "pro", 40L),
      ("u1", 500L, "free", 50L), // back to free = NEW version
      ("u2", 100L, "pro", 60L))
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
      ("u", 1L, null.asInstanceOf[String], 1L), ("u", 2L, null.asInstanceOf[String], 2L),
      ("u", 3L, "x", 3L), ("u", 4L, null.asInstanceOf[String], 4L))
    val got = Scd2.history(ev(rows), "user", "ts", "plan", "eid")
      .orderBy("version").collect()
      .map(r => (Option(r.getString(1)), r.getInt(4)))
    assert(got.toSeq == Seq((None, 1), (Some("x"), 2), (None, 3)))
  }

  test("point-in-time lookup: as-of on valid_from is the interval join") {
    // versions: free@100, pro@300 -> fact at 250 sees free(v1), at 300 pro(v2)
    val dimRows = Seq(("u", 100L, "free", 10L), ("u", 300L, "pro", 20L),
      ("u", 300L, "max", 30L)) // same-ms re-change: later tie wins (v3)
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

  test("merge(history(E1), E2) == history(E1 ++ E2) under the append contract") {
    // u1: batch re-asserts current value (seam absorb) then changes
    // u2: batch opens with a change (stored current closes at the seam)
    // u3: untouched by the batch; u4: brand new in the batch
    val e1 = Seq(
      ("u1", 100L, "free", 10L), ("u1", 200L, "pro", 20L),
      ("u2", 100L, "basic", 30L), ("u2", 300L, "plus", 40L),
      ("u3", 50L, "solo", 50L))
    val e2 = Seq(
      ("u1", 400L, "pro", 60L), ("u1", 500L, "max", 70L),
      ("u2", 600L, "ultra", 80L),
      ("u4", 700L, "new", 90L))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id", "version").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4), r.getBoolean(5)))
        .toSeq
    val merged = Scd2.merge(Scd2.history(ev(e1), "user", "ts", "plan", "eid"),
      ev(e2), "user", "ts", "plan", "eid")
    val full = Scd2.history(ev(e1 ++ e2), "user", "ts", "plan", "eid")
    assert(canon(merged) == canon(full))
    // spot-check the seams: u1 stays 3 versions (re-assertion absorbed),
    // u2's stored current closed at 600, u3 untouched, u4 version 1
    val m = canon(merged)
    assert(m.count(_._1 == "u1") == 3)
    assert(m.filter(_._1 == "u2").map(v => (v._2, v._4)).toSet ==
      Set(("basic", 300L), ("plus", 600L), ("ultra", -1L)))
    assert(m.filter(_._1 == "u3") == Seq(("u3", "solo", 50L, -1L, 1, true)))
    assert(m.filter(_._1 == "u4") == Seq(("u4", "new", 700L, -1L, 1, true)))
  }

  test("tie column breaks same-millisecond ordering deterministically") {
    val rows = Seq(("u", 5L, "b", 20L), ("u", 5L, "a", 10L))
    val got = Scd2.history(ev(rows), "user", "ts", "plan", "eid")
      .orderBy("version").collect().map(_.getString(1))
    assert(got.toSeq == Seq("a", "b")) // e1 before e2
    val re = Scd2.history(ev(rows).repartition(3), "user", "ts", "plan", "eid")
      .orderBy("version").collect().map(_.getString(1))
    assert(re.toSeq == got.toSeq)
  }
}
