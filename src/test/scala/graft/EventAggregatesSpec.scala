package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.EventAggregates

class EventAggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, ts("2024-01-01 00:01:00"), 1L, "click", 1.0),
    (2L, ts("2024-01-01 00:02:00"), 1L, "click", 2.0),
    (3L, ts("2024-01-01 00:07:00"), 2L, "buy", 10.0),
    (4L, ts("2024-01-01 00:08:30"), 1L, "click", 3.0),
    (5L, ts("2024-01-01 01:00:00"), 2L, "buy", 20.0) // separate session
  )
  private def batchDf = rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("tumbling window aggregates (batch semantics)") {
    val out = EventAggregates.tumblingCounts(batchDf)
      .orderBy("window_start", "event_type").collect()
    // windows: [00:00,00:05) click x2; [00:05,00:10) buy x1 + click x1; [01:00,01:05) buy x1
    assert(out.length == 4)
    assert(out(0).getAs[Long]("n") == 2 && out(0).getAs[Double]("sum_value") == 3.0)
  }

  test("sliding windows: each event lands in size/slide overlapping windows") {
    val out = EventAggregates.slidingRates(batchDf) // 10 min windows, 5 min slide
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n")))
    // clicks at 00:01/00:02 -> windows starting 23:55 and 00:00;
    // click 00:08:30 + buy 00:07 -> 00:00 and 00:05; buy 01:00 -> 00:55, 01:00
    assert(out.toSeq == Seq(
      ("2023-12-31 23:55:00.0", "click", 2L),
      ("2024-01-01 00:00:00.0", "click", 3L),
      ("2024-01-01 00:00:00.0", "buy", 1L),
      ("2024-01-01 00:05:00.0", "buy", 1L),
      ("2024-01-01 00:05:00.0", "click", 1L),
      ("2024-01-01 00:55:00.0", "buy", 1L),
      ("2024-01-01 01:00:00.0", "buy", 1L)).sortBy(r => (r._1, r._2)))
    // total window-memberships = events x (size/slide)
    assert(out.map(_._3).sum == rows.length * 2)
  }

  test("session windows close after gap") {
    val out = EventAggregates.userSessions(batchDf, gap = "10 minutes")
      .orderBy("user_id", "session_start").collect()
    // user1: one session 00:01-00:18.5 (3 events); user2: two sessions
    assert(out.length == 3)
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 1 && u1.head.getAs[Long]("n_events") == 3)
  }

  test("streaming run produces the same tumbling aggregates as batch") {
    val dir = Files.createTempDirectory("graft_ev_stream")
    val json = rows.map { case (id, t, u, et, v) =>
      s"""{"event_id":$id,"ts":"${t.toInstant}","user_id":$u,"event_type":"$et","value":$v}"""
    }
    Files.write(dir.resolve("part1.json"), json.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val schema = batchDf.schema
    val stream = spark.readStream.schema(schema).json(dir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    val q = EventAggregates.tumblingCounts(stream)
      .writeStream.outputMode("append").format("memory").queryName("tumbling_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // append mode only emits windows the watermark has passed; with a
    // single batch the final windows stay open, so compare the CLOSED set
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type").collect()
    val batch = EventAggregates.tumblingCounts(batchDf)
      .orderBy("window_start", "event_type").collect()
    assert(streamed.map(_.toString).toSet.subsetOf(batch.map(_.toString).toSet))
  }

  test("stateful milestones emit on every nth event per user") {
    val many = (1 to 25).map(i =>
      EventAggregates.UserEvent(i.toLong, ts(f"2024-01-01 00:${i % 60}%02d:00"), 7L, "click", 1.0))
    val out = EventAggregates.userMilestones(many.toDS(), every = 10)
      .collect().sortBy(_.milestone)
    assert(out.map(_.n_events).toSeq == Seq(10L, 20L))
    assert(out.forall(_.user_id == 7L))
  }
}
