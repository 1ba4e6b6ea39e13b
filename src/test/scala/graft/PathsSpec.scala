package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Paths

class PathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("user", "ms", "etype", "eid")
      .select($"user", timestamp_millis($"ms").as("ts"), $"etype", $"eid")

  // user 1: [a b a b] then (after a 1-hour gap) [c a]; user 2: [b c]
  private val rows = Seq(
    (1L, 1000L, "a", 1L), (1L, 2000L, "b", 2L), (1L, 3000L, "a", 3L),
    (1L, 4000L, "b", 4L),
    (1L, 4000000L, "c", 5L), (1L, 4001000L, "a", 6L),
    (2L, 1000L, "b", 7L), (2L, 2000L, "c", 8L))

  test("transitions: session-bounded counts and integer row-normalization") {
    val got = Paths.transitions(ev(rows), "user", "ts", "etype", "eid")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // a->b x2 (both in session 1 of user 1); b->a x1; b->c x1; c->a x1.
    // NO b->c from 4000 -> 4000000 (session boundary blocks it)... but
    // user2 has b->c inside one session.
    assert(got == Map(
      ("a", "b") -> ((2L, 10000L)),
      ("b", "a") -> ((1L, 5000L)),
      ("b", "c") -> ((1L, 5000L)),
      ("c", "a") -> ((1L, 10000L))))
  }

  test("dwellTimes: gap attributed to the preceding type, session tails excluded") {
    val got = Paths.dwellTimes(ev(rows), "user", "ts", "etype", "eid")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // user1 session1 [a b a b]: a dwells 1000 (x2), b dwells 1000 (x1,
    // the final b is a tail); session2 [c a]: c dwells 1000, a is tail.
    // user2 [b c]: b dwells 1000, c is tail. The 1-hour gap between
    // user1's sessions must NOT appear as a 3,996,000 ms b-dwell.
    assert(got == Map(
      "a" -> ((2L, 2000L, 1000L, 1000L)),
      "b" -> ((2L, 2000L, 1000L, 1000L)),
      "c" -> ((1L, 1000L, 1000L, 1000L))))
  }

  test("topPaths: n-grams never cross sessions, ranked deterministically") {
    val got = Paths.topPaths(ev(rows), "user", "ts", "etype", "eid",
        steps = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // session [a b a b] -> trigrams "a > b > a", "b > a > b"; the
    // 2-event sessions yield none
    assert(got.toSeq == Seq(("a > b > a", 1L, 1), ("b > a > b", 1L, 2)))
    intercept[IllegalArgumentException](
      Paths.topPaths(ev(rows), "user", "ts", "etype", "eid", steps = 1))
  }

  private def seqEv(rows: Seq[(Long, String, Long)]) =
    rows.toDF("u", "et", "sec").withColumn("ts", timestamp_seconds(col("sec")))

  test("sequenceMatch: in-order subsequences match, reversed ones do not") {
    val rows = Seq(
      (1L, "click", 1L), (1L, "view", 2L), (1L, "purchase", 3L), // matches
      (2L, "purchase", 1L), (2L, "click", 2L))                   // wrong order
    val out = Paths.sequenceMatch(seqEv(rows), "u", "et", "ts",
        Seq("click", "purchase"))
      .collect().map(r => r.getAs[Long]("u") ->
        ((r.getAs[Long]("first_ms"), r.getAs[Long]("last_ms")))).toMap
    assert(out == Map(1L -> ((1000L, 3000L))))
  }

  test("sequenceMatch requires strictly increasing timestamps") {
    val rows = Seq((1L, "a", 5L), (1L, "b", 5L),  // tied: no match
      (2L, "a", 5L), (2L, "b", 6L))
    val out = Paths.sequenceMatch(seqEv(rows), "u", "et", "ts", Seq("a", "b"))
      .collect().map(_.getAs[Long]("u")).toSet
    assert(out == Set(2L))
  }

  test("sequenceMatch: the earliest chain is exact - later detours cannot block a match") {
    // a@1, b@2, a@3, c@4: pattern a,b,c matches via (1,2,4); the chain
    // must not be derailed by the second 'a'
    val rows = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "c", 4L))
    val out = Paths.sequenceMatch(seqEv(rows), "u", "et", "ts", Seq("a", "b", "c"))
      .collect()
    assert(out.length == 1 && out.head.getAs[Long]("last_ms") == 4000L)
  }

  test("sequenceMatch with a repeated step type needs distinct instants") {
    val rows = Seq((1L, "a", 1L),                 // one event: no a,a
      (2L, "a", 1L), (2L, "a", 2L))               // two: matches
    val out = Paths.sequenceMatch(seqEv(rows), "u", "et", "ts", Seq("a", "a"))
      .collect().map(_.getAs[Long]("u")).toSet
    assert(out == Set(2L))
  }
}
