package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.EventSchema._

/** ReplacingMergeTree-equivalent semantics, native in Spark.
  *
  * The reference delegates all dedup/upsert to ClickHouse table engines:
  *  - event tables:  ReplacingMergeTree() ORDER BY (timestamp, message_id)
  *    (clickhouse.py:81-88)  -> O-22
  *  - users:         ReplacingMergeTree(ver) ORDER BY (user_id)
  *    (clickhouse.py:112-118) -> O-21 last-write-wins
  *  - misfits:       ReplacingMergeTree() ORDER BY (message_id, table_name,
  *    column_name) (clickhouse.py:222-233) -> O-23
  *
  * A Spark-managed lakehouse has no merge engine, so these are implemented
  * as operators. Each is a single hash-shuffle on the dedup key (the same
  * work CH does at merge time, paid up front); last-write-wins uses a
  * window over the key partition — at scale this is the standard
  * shuffle-once pattern and AQE handles skewed keys.
  */
object Dedup {

  /** O-22: collapse duplicate (timestamp, message_id) rows within a batch.
    * Arbitrary-survivor semantics, same as CH merge. */
  def dedupEvents(df: DataFrame): DataFrame =
    df.dropDuplicates(Timestamp, MessageId)

  /** Deterministic variant: keep exactly the row that wins a total order —
    * needed whenever output must be reproducible (oracle checks, idempotent
    * re-ingest). */
  def dedupDeterministic(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** O-21: last-write-wins per key by version column (highest `ver` wins;
    * `tieBreak` makes the winner total-ordered and hence deterministic). */
  def lastWriteWins(
      df: DataFrame,
      keys: Seq[String],
      ver: String,
      tieBreak: Seq[Column] = Nil
  ): DataFrame =
    dedupDeterministic(df, keys, (col(ver).desc +: tieBreak))

  /** O-21 prep: the users stream derived from identities — non-null user_id,
    * ver = epoch-millis of `timestamp` (reference send_to_warehouse.py:163-189
    * uses epoch; we use millis to match unix_timestamp_in_millis precision). */
  def usersFromIdentities(identities: DataFrame): DataFrame =
    identities
      .filter(col(UserId).isNotNull)
      .withColumn(Ver, unix_millis(col(Timestamp)))

  /** O-23: misfit dedup on (message_id, table_name, column_name). */
  def dedupMisfits(misfits: DataFrame): DataFrame =
    misfits.dropDuplicates(MessageId, "table_name", "column_name")
}
