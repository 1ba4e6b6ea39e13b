package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression guard for the round-6 breaker: the driver regenerated
  * /root/testdata and events.ts flipped from parquet TIMESTAMP(NANOS) to
  * timestamp[us], breaking every events query at analysis time because
  * SparkEntry.events() hard-assumed nanos. events() is now schema-adaptive;
  * this spec writes one fixture per generation style and asserts both load
  * to the SAME TimestampType instants. */
class EventsSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one instant, expressed per fixture generation
  private val micros = 1721999999123456L // 2024-07-26T13:19:59.123456 UTC

  private def loadTs(dir: String): (DataType, Seq[Long]) = {
    val df = SparkEntry.events(spark, dir)
    (df.schema("ts").dataType,
      df.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted)
  }

  test("nanos-long fixture and micros-timestamp fixture load identically") {
    val root = java.nio.file.Files.createTempDirectory("events_schema").toString

    // Generation A: ts as raw int64 nanoseconds — how a TIMESTAMP(NANOS)
    // column arrives under spark.sql.legacy.parquet.nanosAsLong=true.
    Seq((1L, micros * 1000L + 789L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$root/nanos/events.parquet")

    // Generation B: ts as native timestamp[us] without timezone — what the
    // regenerated driver fixtures carry (arrives as TIMESTAMP_NTZ).
    Seq((1L, micros, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$root/ntz/events.parquet")

    // Generation B': session-zoned timestamp[us] (isAdjustedToUTC=true).
    Seq((1L, micros, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$root/tz/events.parquet")

    val (tNanos, vNanos) = loadTs(s"$root/nanos")
    val (tNtz, vNtz) = loadTs(s"$root/ntz")
    val (tTz, vTz) = loadTs(s"$root/tz")

    // every generation lands on session-local TimestampType…
    assert(tNanos == TimestampType)
    assert(tNtz == TimestampType)
    assert(tTz == TimestampType)
    // …at the same µs instant (the ns fixture truncates its sub-µs tail,
    // exactly as DuckDB does reading the same file)
    assert(vNanos == Seq(micros))
    assert(vNtz == Seq(micros))
    assert(vTz == Seq(micros))
  }
}
