package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Cardinality, CountMin}
import graft.sink.SnapshotSink

/** STREAMING INGESTION for the stored-state rollup (q136's write path as
  * a Structured Streaming job): each micro-batch's per-day KMV states
  * are MERGED into the snapshot-committed state table — KMV closure
  * makes the merge associative, so the accumulated store equals the
  * states one all-at-once batch build would produce no matter how the
  * stream chops the data (asserted by the StreamingSpec twin). Trailing
  * windows are then answered from the store by
  * [[Cardinality.trailingDistinctFromStates]] without ever rescanning
  * events — the ClickHouse AggregatingMergeTree deployment loop
  * (reference seghouse delegates rollups to exactly this warehouse
  * shape; see `reference/seghouse/warehouse/clickhouse.py:81-88`),
  * rebuilt native.
  *
  * foreachBatch rather than a stateful aggregation: the state lives in
  * the SNAPSHOT TABLE (readable by any engine, mergeable across
  * clusters), not in the stream's checkpoint — restart-safe because
  * commits are atomic manifest renames and micro-batch replays re-merge
  * idempotently-shaped states (a re-merged sketch is unchanged:
  * `merge(s, s) = s` for KMV).
  *
  * Scale shape: per micro-batch, one map-side-combined scan down to ≤ k
  * longs per day, one state-sized merge against the stored table —
  * events never accumulate anywhere. */
object StateRollup {

  /** Start an AvailableNow/continuous ingestion of `stream` (must carry
    * `dayCol` and `valueCol`) that folds each micro-batch's daily KMV
    * states into the snapshot root. One snapshot version per non-empty
    * micro-batch.
    *
    * Each commit is a full (state-sized — ≤ k longs per day) copy of the
    * merged table, so a long-running stream retires old versions as it
    * goes: `keepVersions` snapshots are retained and older ones vacuumed
    * after every commit (readers of the retained versions are never
    * affected; in-flight commits are protected by vacuum's grace
    * period). Set `keepVersions = Int.MaxValue` to keep the whole
    * lineage (e.g. for time-travel tests). */
  def appendDailyKmvStates(
      stream: DataFrame,
      valueCol: String,
      dayCol: String,
      k: Int,
      root: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      keepVersions: Int = 3
  ): StreamingQuery = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist: the emptiness probe and the sketch build must not
        // re-read the source twice per trigger
        val b = batch.persist()
        try {
          if (b.take(1).nonEmpty) {
            val spark = b.sparkSession
            val states = Cardinality.kmvSketches(b, valueCol, dayCol, k)
              .withColumnRenamed("segment", "day")
            val merged =
              if (SnapshotSink.versions(spark, root).isEmpty) states
              else Cardinality.mergeKmvStates(SnapshotSink.read(spark, root), states, k)
            SnapshotSink.commit(merged, root)
            if (keepVersions != Int.MaxValue)
              SnapshotSink.vacuum(spark, root, keepLast = keepVersions)
            ()
          }
        } finally { b.unpersist(); () }
      }
      .trigger(trigger)
      .start()
  }

  /** The COUNT-MIN twin of [[appendDailyKmvStates]]: each micro-batch's
    * per-day CM state rows fold into the stored table by ADDITION
    * ([[CountMin.mergeDailyStates]] — linear sketch, exact for ANY
    * split of the stream, split days included, so unlike the day-grain
    * candidate tables this ingestion needs no alignment between
    * micro-batch boundaries and days). Same snapshot-commit semantics
    * and retention as the KMV variant. `valueCol` is normalized to
    * non-null strings here (the [[CountMin.trailingHeavyHitters]]
    * convention). */
  def appendDailyCmStates(
      stream: DataFrame,
      valueCol: String,
      dayCol: String,
      depth: Int,
      width: Int,
      root: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      keepVersions: Int = 3
  ): StreamingQuery = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          if (b.take(1).nonEmpty) {
            val spark = b.sparkSession
            val nn = b.filter(org.apache.spark.sql.functions.col(valueCol).isNotNull)
              .select(
                org.apache.spark.sql.functions.col(dayCol).as("d"),
                org.apache.spark.sql.functions.col(valueCol).cast("string").as("v"))
            val states = CountMin.dailyStates(nn, "v", "d", depth, width)
            val merged =
              if (SnapshotSink.versions(spark, root).isEmpty) states
              else CountMin.mergeDailyStates(SnapshotSink.read(spark, root), states)
            SnapshotSink.commit(merged, root)
            if (keepVersions != Int.MaxValue)
              SnapshotSink.vacuum(spark, root, keepLast = keepVersions)
            ()
          }
        } finally { b.unpersist(); () }
      }
      .trigger(trigger)
      .start()
  }
}
