package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over the clickstream shape
  * (`event_id, ts, user_id, event_type, value`).
  *
  * The reference has no streaming runtime at all (batch CLI, SURVEY §2.1);
  * these operators are the Structured Streaming surface a warehouse-bound
  * clickstream pipeline actually needs: watermarked tumbling/sliding
  * window aggregates, session windows, and an arbitrary-stateful
  * per-user operator via mapGroupsWithState. All are late-data-safe:
  * the watermark bounds state, so they run indefinitely at 100 TB/day
  * without unbounded state growth.
  *
  * Every function takes a streaming OR batch DataFrame — the logical plan
  * is identical, which is how the specs assert batch/stream parity.
  */
object EventAggregates {

  /** Tumbling event-time window counts+sums per event type. */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows (overlapping) — rate trends. */
  def slidingRates(
      events: DataFrame,
      windowLen: String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user: a session closes after `gap` of
    * inactivity. The state-heavy operator — watermark is mandatory. */
  def userSessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  final case class UserEvent(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class UserRunningState(nEvents: Long, totalValue: Double)
  final case class UserMilestone(user_id: Long, n_events: Long,
      total_value: Double, milestone: Long)

  /** Arbitrary stateful processing: per-user running totals that emit a
    * row whenever a user crosses another `every`-events milestone
    * (KeyValueGroupedDataset.flatMapGroupsWithState). ProcessingTime
    * timeout keeps abandoned users' state collectable. */
  def userMilestones(events: Dataset[UserEvent], every: Long = 10): Dataset[UserMilestone] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunningState, UserMilestone](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunningState]) =>
          val prev = state.getOption.getOrElse(UserRunningState(0L, 0.0))
          var n = prev.nEvents
          var total = prev.totalValue
          val out = scala.collection.mutable.ArrayBuffer[UserMilestone]()
          rows.foreach { e =>
            n += 1; total += e.value
            if (n % every == 0) out += UserMilestone(userId, n, total, n / every)
          }
          state.update(UserRunningState(n, total))
          out.iterator
      }
  }
}
