package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the exact boundary semantics of Spark's native session_window
  * that q243's oracle replays: an event landing EXACTLY on the open
  * window's end (gap == gapDuration) MERGES and extends the session;
  * one microsecond past it starts a new session. If a Spark upgrade
  * ever flips this to a strict-inequality merge, this spec fails before
  * the correctness gate does. */
class SessionWindowSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sessions(us: Seq[Long]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    us.map(u => (1L, u)).toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("session_window.start")),
        unix_micros(col("session_window.end")), col("n"))
      .orderBy(col("session_window.start"))
      .as[(Long, Long, Long)].collect().toSeq
  }

  private val Gap = 1800000000L // 30 min in microseconds

  test("an event exactly at the window end merges (gap == gap merges)") {
    assert(sessions(Seq(0L, Gap)) === Seq((0L, 2 * Gap, 2L)))
  }

  test("one microsecond past the window end splits") {
    assert(sessions(Seq(0L, Gap + 1)) ===
      Seq((0L, Gap, 1L), (Gap + 1, 2 * Gap + 1, 1L)))
  }

  test("window end is last event + gap, start is first event") {
    assert(sessions(Seq(100L, 200L, 300L)) === Seq((100L, 300L + Gap, 3L)))
  }

  test("chained sub-gap events keep extending one session") {
    // each consecutive gap is just under the limit; total span >> gap
    val ts = (0L to 4L).map(_ * (Gap - 1))
    assert(sessions(ts) === Seq((0L, 4 * (Gap - 1) + Gap, 5L)))
  }
}
