package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVIVAL ANALYSIS — discrete-time Nelson–Aalen cumulative hazard with
  * right-censoring, the estimator behind "how long until the next
  * purchase / the next crash / churn?" when the observation window cuts
  * some subjects off before their event arrives. Ignoring censoring
  * (e.g. q203's conversion-latency view of completed pairs only) biases
  * the readout optimistic: the slowest subjects are exactly the ones the
  * window truncates. The at-risk denominator is how survival analysis
  * reinstates them.
  *
  * Numeric discipline (the [[Trend]]/[[Experiment]] convention): all
  * counts are BIGINT, each hazard term is one truncating `DIV` into ppm,
  * and the cumulative hazard is a prefix sum of the already-truncated
  * terms — the truncation order is part of the defined semantics the
  * DuckDB oracle replays term-for-term. No floating point anywhere, so
  * the readout is bit-identical on any engine and aggregation order.
  *
  * Scale shape: [[timeToNextDurations]] is one user-partitioned window
  * over the subject stream (the same shuffle a sessionization pass
  * already needs) plus a 1-row broadcast horizon; [[nelsonAalen]] then
  * aggregates subjects down to DURATION-BUCKET granularity — bounded by
  * the calendar (a 10-year log at day grain is ≤ 3,653 rows) — and only
  * the bucket frame sees unpartitioned windows. 100 TB of events never
  * meets a window wider than one user's history.
  */
object Survival {

  /** Build right-censored time-to-next-occurrence subjects from an
    * occurrence stream: one row per occurrence, `dur` = whole-`dayCol`
    * units until the same subject's next occurrence, `observed` = 1. The
    * LAST occurrence of each subject has no successor — it is censored
    * at the corpus horizon (max `dayCol` over the stream): `dur` =
    * horizon − day, `observed` = 0, meaning "survived at least this
    * long, outcome unknown".
    *
    * Ordering within a subject is by `orderCols` (pass the event
    * timestamp plus a unique id so same-timestamp rows resolve
    * deterministically); durations are taken on the integral `dayCol`,
    * so same-day successors yield dur = 0 — a real bucket, not an error.
    *
    * @param df        occurrence stream (already filtered to the event
    *                  of interest)
    * @param subjectCol grouping identity (user id)
    * @param dayCol    integral time bucket (epoch day)
    * @param orderCols deterministic within-subject order (ts, event id)
    */
  def timeToNextDurations(df: DataFrame, subjectCol: String, dayCol: String,
      orderCols: Seq[String], carryCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(subjectCol)).orderBy(orderCols.map(col): _*)
    val horizon = df.agg(max(col(dayCol)).cast("long").as("h_day"))
    df.withColumn("next_day", lead(col(dayCol), 1).over(w))
      .crossJoin(broadcast(horizon)) // 1-row scalar frame (the q84 pattern)
      .select(Seq(
        when(col("next_day").isNotNull, col("next_day") - col(dayCol))
          .otherwise(col("h_day") - col(dayCol)).cast("long").as("dur"),
        when(col("next_day").isNotNull, lit(1L)).otherwise(lit(0L))
          .as("observed")) ++ carryCols.map(col): _*)
  }

  /** Discrete Nelson–Aalen hazard table over censored duration subjects.
    *
    * For each duration bucket d that any subject reaches exactly:
    *   - events_d   = subjects whose event occurred at duration d
    *   - censored_d = subjects last seen at duration d (no event)
    *   - at_risk_d  = subjects with duration ≥ d (reverse prefix sum —
    *                  still at risk when d begins)
    *   - hazard_ppm = 10⁶·events_d DIV at_risk_d  (discrete hazard)
    *   - cum_hazard_ppm = Σ_{d'≤d} hazard_ppm  (Nelson–Aalen; survival
    *     ≈ exp(−H) is left to the reader — the exact integer H is the
    *     engine's deliverable)
    *
    * Censored subjects leave the risk set at their censoring duration
    * without contributing an event — the whole point of the estimator.
    *
    * @param subjects (dur, observed) frame from [[timeToNextDurations]]
    *                 or any censored-duration source; dur integral,
    *                 observed ∈ {0, 1}
    */
  def nelsonAalen(subjects: DataFrame, durCol: String = "dur",
      obsCol: String = "observed"): DataFrame =
    nelsonAalenFromBuckets(bucketCounts(subjects, durCol, obsCol))

  /** The mergeable survival STATE: per duration bucket, event and
    * censor counts. Plain sums — two batches' states merge by adding
    * per-bucket ([[mergeBucketStates]]), so the state can live in a
    * snapshot store ([[graft.sink.SnapshotSink]]) or a streaming
    * aggregation and the estimator finish never re-reads subjects. */
  def bucketCounts(subjects: DataFrame, durCol: String = "dur",
      obsCol: String = "observed"): DataFrame =
    subjects
      .groupBy(col(durCol).cast("long").as("dur_day"))
      .agg(sum(col(obsCol)).cast("long").as("events"),
        sum(lit(1L) - col(obsCol)).cast("long").as("censored"))

  /** Merge two bucket-state frames: per-bucket sums (counts are the
    * canonical mergeable sketch — associative, commutative, exact). */
  def mergeBucketStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("dur_day")
      .agg(sum(col("events")).cast("long").as("events"),
        sum(col("censored")).cast("long").as("censored"))

  /** The stateless Nelson–Aalen finish over stored bucket counts —
    * [[nelsonAalen]] is exactly [[bucketCounts]] piped through this. */
  def nelsonAalenFromBuckets(buckets: DataFrame): DataFrame = {
    // bucket frame is calendar-bounded — unpartitioned windows are safe
    val wRisk = Window.orderBy(col("dur_day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("dur_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("at_risk", sum(col("events") + col("censored")).over(wRisk))
      .withColumn("hazard_ppm", expr("(1000000 * events) DIV at_risk"))
      .withColumn("cum_hazard_ppm", sum(col("hazard_ppm")).over(wCum))
      .select(col("dur_day"), col("at_risk"), col("events"), col("censored"),
        col("hazard_ppm"), col("cum_hazard_ppm"))
      .orderBy("dur_day")
  }

  /** TWO-GROUP LOG-RANK TEST — "do these two populations churn at the
    * same rate?", answered against the full censored hazard curves
    * rather than a single mean (which censoring biases). The classic
    * Mantel–Cox construction at day grain: per duration bucket with
    * events, group 1's observed events vs its hypergeometric
    * expectation e_d·r1_d/r_d and variance
    * e_d·r1_d·(r_d−r1_d)·(r_d−e_d) / (r_d²·(r_d−1)); the statistic
    * (O₁−E₁)²/V is χ²₁ under the null, rejected at α=.05 against the
    * house-pinned 38416e-4 (= 1.96², the [[Experiment]] constant).
    *
    * Integer discipline: every per-bucket expectation/variance term is
    * one truncating DIV into micro units and the sums add the truncated
    * terms — the oracle replays that order. The rejection comparison is
    * fully cross-multiplied (no division at all).
    *
    * Scale shape: one (dur, group)-grain aggregate, reverse-prefix
    * windows over the calendar-bounded bucket frame, one final 1-row
    * aggregate. Subjects stream through exactly one shuffle.
    *
    * @param subjects (dur, observed, group) frame — [[timeToNextDurations]]
    *                 output plus a boolean `inG1Col`
    * @return one row: n1, n2, o1, e1_micro, v_micro, chi2_milli, reject
    */
  def logRank(subjects: DataFrame, durCol: String, obsCol: String,
      inG1Col: Column): DataFrame = {
    val buckets = subjects
      .groupBy(col(durCol).cast("long").as("dur_day"))
      .agg(
        sum(when(inG1Col, col(obsCol)).otherwise(0L)).cast("long").as("e1"),
        sum(when(inG1Col, lit(1L) - col(obsCol)).otherwise(0L)).cast("long")
          .as("c1"),
        sum(when(!inG1Col, col(obsCol)).otherwise(0L)).cast("long").as("e2"),
        sum(when(!inG1Col, lit(1L) - col(obsCol)).otherwise(0L)).cast("long")
          .as("c2"))
    val wRisk = Window.orderBy(col("dur_day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("dur_day"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val terms = buckets
      .withColumn("r1", sum(col("e1") + col("c1")).over(wRisk))
      .withColumn("r2", sum(col("e2") + col("c2")).over(wRisk))
      // group totals = at-risk at the globally smallest duration —
      // captured BEFORE censor-only buckets are filtered away
      .withColumn("nn1", max(col("r1")).over(wAll))
      .withColumn("nn2", max(col("r2")).over(wAll))
      .withColumn("r", col("r1") + col("r2"))
      .withColumn("e", col("e1") + col("e2"))
      .filter(col("e") > 0)
      .withColumn("exp1_micro",
        expr("(1000000 * e * r1) DIV r"))
      .withColumn("var_micro",
        when(col("r") > 1, expr(
          """(1000000 * CAST(e AS DECIMAL(38,0)) * r1 * (r - r1) * (r - e))
            | DIV (CAST(r AS DECIMAL(38,0)) * r * (r - 1))"""
            .stripMargin.replace("\n", " "))).otherwise(0L))
    terms.agg(
        max(col("nn1")).as("n1"), max(col("nn2")).as("n2"),
        sum(col("e1")).as("o1"),
        sum(col("exp1_micro")).as("e1_micro"),
        sum(col("var_micro")).cast("long").as("v_micro"))
      .withColumn("_diff", (col("o1") * 1000000L - col("e1_micro"))
        .cast("decimal(38,0)"))
      .withColumn("chi2_milli",
        when(col("v_micro") > 0, expr("(_diff * _diff) DIV (1000 * v_micro)"))
          .cast("long"))
      .withColumn("reject",
        col("_diff") * col("_diff") * 10000L >
          lit(38416L).cast("decimal(38,0)") * col("v_micro") * 1000000L)
      .select("n1", "n2", "o1", "e1_micro", "v_micro", "chi2_milli", "reject")
  }
}
