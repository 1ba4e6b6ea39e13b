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
  * both partitioned by the user key: one shuffle, no global sort. The
  * incremental deployment processes only users present in the new
  * batch (groupBy on the same key) and stitches at the seam by
  * comparing the batch's first value to the stored current row. */
object Scd2 {

  /** `(user_id, attr, valid_from_ms, valid_to_ms, version, is_current)`
    * — one row per value run, versions numbered from 1 in time order. */
  def history(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      attrCol: String,
      tieCol: String
  ): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("tie").asc)
    val changes = df
      .select(col(userCol).as("user_id"), unix_millis(col(tsCol)).as("ms"),
        col(attrCol).as("attr"), col(tieCol).as("tie"))
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
}
