package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.jobs.{JobConf, SendToWarehouseJob}

/** Structured Streaming variant of the ingestion job (SURVEY §7.3).
  *
  * The reference is a batch CLI over <100 files (seghouse/app.py:23-27);
  * its only streaming-ish semantic is idempotent re-delivery via
  * ReplacingMergeTree dedup on message_id (O-22). Natively:
  * `readStream.json(dir)` + event-time watermark on `timestamp` +
  * `dropDuplicatesWithinWatermark(message_id)` gives exactly-once-per-
  * message-id ingestion with bounded state, and `foreachBatch` reuses the
  * batch `processBatch` core unchanged — one code path for both runtimes.
  */
object StreamingSend {

  def start(
      spark: SparkSession,
      conf: JobConf,
      namespace: String,
      sourceDir: String,
      sourceSchema: StructType,
      checkpointDir: String,
      watermark: String = "1 hour",
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val job = new SendToWarehouseJob(spark, conf, namespace)
    val raw = spark.readStream.schema(sourceSchema).json(sourceDir)

    val deduped =
      if (raw.columns.contains("timestamp") && raw.columns.contains("messageId"))
        raw
          .withColumn("__event_ts", to_timestamp(col("timestamp")))
          .withWatermark("__event_ts", watermark)
          .dropDuplicatesWithinWatermark("messageId")
          .drop("__event_ts")
      else raw

    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) job.processBatch(batch)
      }
      .start()
  }
}
