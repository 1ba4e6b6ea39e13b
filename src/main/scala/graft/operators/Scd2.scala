package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING-DIMENSION TYPE 2 history from an event stream: where
  * the reference's users table keeps ONLY the last write per user
  * (O-21, `Dedup.usersLastWrite`), this operator keeps every attribute
  * VERSION with its validity interval — the warehouse-side history
  * table (`valid_from_ms`, `valid_to_ms`, `version`, `is_current`) that
  * answers "what was this user's plan when that order was placed".
  *
  * Contract: events are ordered per user by (ms, tieCol); consecutive
  * runs of the SAME attribute value collapse to one version anchored at
  * the run's first event (standard SCD2 — a re-assertion of the current
  * value is not a new version; NULL attributes are values too, compared
  * null-safely). `valid_to_ms` is the next version's start (null for
  * the open current version) — half-open intervals that tile each
  * user's timeline with no gaps.
  *
  * Scale shape: two windows over the same (user, ms, tie) order — one
  * lag to mark run starts, one lead over the collapsed change rows —
  * both partitioned by the user key: one shuffle, no global sort.
  * [[merge]] is the incremental deployment: only users present in the
  * new batch are rebuilt (their stored version ANCHORS replayed as
  * pseudo-events — version-count-sized, never the original stream),
  * everyone else passes through untouched. */
object Scd2 {

  /** Core in the integer-ms domain: input `(user_id, ms, attr, tie)`,
    * output the history schema. */
  private def historyMs(e: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("tie").asc)
    val changes = e
      .withColumn("__prev", lag(col("attr"), 1).over(byUser))
      .withColumn("__first", row_number().over(byUser) === 1)
      // null-safe change test: first row, or value differs from previous
      .filter(col("__first") || !(col("attr") <=> col("__prev")))
    val byVersion = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("tie").asc)
    changes
      .withColumn("valid_from_ms", col("ms"))
      .withColumn("valid_to_ms", lead(col("ms"), 1).over(byVersion))
      .withColumn("version", row_number().over(byVersion))
      .withColumn("is_current", col("valid_to_ms").isNull)
      .select("user_id", "attr", "valid_from_ms", "valid_to_ms",
        "version", "is_current")
  }

  /** `(user_id, attr, valid_from_ms, valid_to_ms, version, is_current)`
    * — one row per value run, versions numbered from 1 in time order. */
  def history(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      attrCol: String,
      tieCol: String
  ): DataFrame =
    historyMs(df.select(col(userCol).as("user_id"),
      unix_millis(col(tsCol)).as("ms"),
      col(attrCol).as("attr"), col(tieCol).cast("long").as("tie")))

  /** INCREMENTAL SCD2 maintenance: fold a new event batch into a stored
    * history table. Users absent from the batch pass through without
    * being read twice or rewritten; for batch users the stored version
    * anchors (valid_from, attr — version-count rows, not the original
    * event stream) are replayed as pseudo-events and re-run through the
    * same collapse, so a batch value equal to the stored current one is
    * absorbed as a re-assertion and a differing one closes the open
    * interval at the batch change's millisecond.
    *
    * Contract (the append-only stream contract): batch events for a
    * user are event-time ≥ that user's stored `valid_from_ms` anchors.
    * Late events BETWEEN old anchors reorder against collapsed history
    * that no longer exists — rebuild those users from the full stream
    * instead. Anchor ties replay as (ms, version); batch ties must be
    * non-negative so seam ordering at an equal millisecond is stable
    * only when the contract holds (documented, not silently repaired).
    *
    * Property (see Scd2Spec): `merge(history(E1), E2)` ≡
    * `history(E1 ∪ E2)` under the contract. */
  def merge(
      current: DataFrame,
      batch: DataFrame,
      userCol: String,
      tsCol: String,
      attrCol: String,
      tieCol: String
  ): DataFrame = {
    val users = batch.select(col(userCol).as("user_id")).distinct()
    val untouched = current.join(users, Seq("user_id"), "left_anti")
    val anchors = current.join(users, Seq("user_id"), "left_semi")
      .select(col("user_id"), col("valid_from_ms").as("ms"),
        col("attr"), col("version").cast("long").as("tie"))
    val batchEv = batch.select(col(userCol).as("user_id"),
      unix_millis(col(tsCol)).as("ms"),
      col(attrCol).as("attr"), col(tieCol).cast("long").as("tie"))
    untouched.unionByName(historyMs(anchors.unionByName(batchEv)))
  }
}
