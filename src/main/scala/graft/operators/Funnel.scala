package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CLICKSTREAM JOURNEY ANALYTICS: windowed funnels and retention
  * cohorts — the two queries every event-warehouse consumer runs on the
  * tables this pipeline lands (ClickHouse ships them as `windowFunnel`
  * and `retention`; here they are plain DataFrame compositions).
  *
  * Funnel contract (earliest-start, strict step order, in-window):
  * step 1's time is the user's FIRST step-1 event; step i+1's time is
  * the first step-(i+1) event at-or-after step i's time and within
  * `windowMs` of step 1. `level` = number of steps reached. This greedy
  * anchor is deliberate — it is deterministic and replayable (ClickHouse
  * windowFunnel scans all anchors; a user whose LATER step-1 event
  * would complete the funnel when the first does not reports a lower
  * level here — a documented semantic, not an approximation of one).
  * Millisecond integers throughout (`unix_millis`): cross-engine-exact,
  * no timezone or interval arithmetic.
  *
  * Scale shape: one narrow (user, type, ms) projection feeds every
  * step; each step is a groupBy on the user key and a user-key equi-join
  * — the same shuffle key throughout, so AQE coalesces and no step
  * shuffles event payloads (3 longs + a type per row). Retention is two
  * aggregations on (user) and (user, period) with integer floor-division
  * period ids — no calendar functions, no timezone trap.
  */
object Funnel {

  /** Per-user funnel progress through `steps` (event-type names, in
    * order): `(user_id, level, step1_ms, …, stepN_ms)` — stepK_ms null
    * once progress stops; users with no step-1 event report level 0 with
    * all nulls. */
  def windowFunnel(
      df: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      windowMs: Long
  ): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(windowMs > 0, "windowMs must be positive")
    val base = df.select(col(userCol).as("user_id"), col(typeCol).as("etype"),
        unix_millis(col(tsCol)).as("ms"))
      .localCheckpoint(true) // consumed once per step + once for the user set
    val acc = steps.zipWithIndex.foldLeft(
        base.select("user_id").distinct()) { case (acc, (step, i)) =>
      val inWindow =
        if (i == 0) lit(true)
        else col("ms") >= col(s"step${i}_ms") &&
          col("ms") <= col("step1_ms") + windowMs
      val reached = base.filter(col("etype") === step)
        .join(acc, Seq("user_id"))
        .filter(inWindow)
        .groupBy("user_id")
        .agg(min(col("ms")).as(s"step${i + 1}_ms"))
        .select("user_id", s"step${i + 1}_ms")
      acc.join(reached, Seq("user_id"), "left")
    }
    val level = steps.indices.foldLeft(lit(0)) { (l, i) =>
      when(col(s"step${i + 1}_ms").isNotNull, lit(i + 1)).otherwise(l)
    }
    acc.select(col("user_id") +: level.as("level") +:
      steps.indices.map(i => col(s"step${i + 1}_ms")): _*)
  }

  /** Weekly-style retention matrix on integer periods of `periodMs`
    * since epoch: cohort = the user's first-activity period,
    * `(cohort_period, period_offset, n_users)` = distinct users of each
    * cohort active `offset` periods later (offset 0 row = cohort size). */
  def retentionCohorts(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      periodMs: Long
  ): DataFrame = {
    require(periodMs > 0, "periodMs must be positive")
    val act = df.select(col(userCol).as("user_id"),
        expr(s"unix_millis(${tsCol}) DIV ${periodMs}L").as("period"))
      .distinct()
      .localCheckpoint(true) // two consumers: cohort min + the offset join
    val cohorts = act.groupBy("user_id").agg(min("period").as("cohort_period"))
    act.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_period"), (col("period") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
