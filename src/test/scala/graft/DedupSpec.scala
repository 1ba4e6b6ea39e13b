package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.etl.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("event dedup collapses duplicate (timestamp, message_id)") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "m1", "a"),
      (ts("2024-01-01 00:00:00"), "m1", "b"),
      (ts("2024-01-01 00:00:01"), "m1", "c")
    ).toDF("timestamp", "message_id", "payload")
    assert(Dedup.dedupEvents(df).count() == 2)
  }

  test("deterministic dedup is idempotent and picks the total-order winner") {
    val df = Seq(("u1", 1L, "x"), ("u1", 3L, "y"), ("u1", 2L, "z"), ("u2", 1L, "w"))
      .toDF("k", "v", "p")
    val once = Dedup.dedupDeterministic(df, Seq("k"), Seq(col("v").desc))
    assert(once.count() == 2)
    assert(once.filter($"k" === "u1").head().getAs[String]("p") == "y")
    // reprocessing the deduped output changes nothing
    val twice = Dedup.dedupDeterministic(once, Seq("k"), Seq(col("v").desc))
    assert(twice.collect().toSet == once.collect().toSet)
  }

  test("last-write-wins keeps max version per key") {
    val df = Seq(("u1", 10L, "old"), ("u1", 20L, "new"), ("u2", 5L, "only"))
      .toDF("user_id", "ver", "state")
    val w = Dedup.lastWriteWins(df, Seq("user_id"), "ver")
      .collect().map(r => r.getAs[String]("user_id") -> r.getAs[String]("state")).toMap
    assert(w == Map("u1" -> "new", "u2" -> "only"))
  }

  test("usersFromIdentities derives non-null user ver from timestamp") {
    val df = Seq(
      (Some("u1"), ts("2024-01-01 00:00:01")),
      (None: Option[String], ts("2024-01-01 00:00:02"))
    ).toDF("user_id", "timestamp")
    val users = Dedup.usersFromIdentities(df)
    assert(users.count() == 1)
    assert(users.head().getAs[Long]("ver") == ts("2024-01-01 00:00:01").getTime)
  }

  test("misfit dedup on (message_id, table_name, column_name)") {
    val df = Seq(("m1", "t", "c", "v1"), ("m1", "t", "c", "v2"), ("m1", "t", "d", "v3"))
      .toDF("message_id", "table_name", "column_name", "column_value")
    assert(Dedup.dedupMisfits(df).count() == 2)
  }
}
