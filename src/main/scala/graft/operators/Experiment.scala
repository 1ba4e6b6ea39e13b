package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B EXPERIMENT READOUT — deterministic variant assignment plus an
  * INTEGER-EXACT two-proportion z-test, one row per metric.
  *
  * Assignment rides [[Sampling.withSplitId]]'s md5 content bucket, so a
  * user's arm is a pure function of (key, salt) — stable across runs,
  * engines, partitionings, and re-ingests, which is the property an
  * experiment ledger actually needs (Spark's `rand` re-rolls membership
  * on every recompute).
  *
  * The 95% significance verdict avoids floating point entirely: with
  * a = c_a·n_b − c_b·n_a, N = n_a+n_b, c = c_a+c_b, the pooled z² > 3.8416
  * test cross-multiplies to
  *     10000 · a² · N  >  38416 · n_a · n_b · c · (N−c)
  * — all integer products, evaluated in DECIMAL(38,0), so the verdict is
  * bit-identical on any engine and any aggregation order. Exactness
  * envelope: |a|²·N·10⁴ must fit 38 digits — holds through ~10⁶ users per
  * arm; beyond that ANSI decimal overflow throws loudly (never a silent
  * wrong verdict). Conversion rates are reported in integer per-myriad.
  *
  * Scale shape: one distinct-shuffle for the user ledger, one aggregate
  * for per-(metric, user) conversion, one user-key join, and a
  * metric-sized final aggregate; the arm totals are a 1-row frame
  * cross-joined in. No driver-side data, no UDFs, no windows.
  */
object Experiment {

  /** Per-metric A/B readout over an event log.
    *
    * @param events    event-level rows
    * @param userCol   experiment unit key (non-null; assignment raises on null)
    * @param metricCol metric identifier column (e.g. event type)
    * @param converted predicate over the per-(metric, user) aggregate,
    *                  which is exposed as column `metric_value` — e.g.
    *                  `col("metric_value") >= 15`
    * @param perUserAgg aggregate over a (metric, user) group, surfaced to
    *                  `converted` as `metric_value` — defaults to row count
    * @param salt      assignment salt (a new salt is a new experiment)
    */
  def abReadout(
      events: DataFrame,
      userCol: String,
      metricCol: String,
      converted: Column,
      perUserAgg: Column = count(lit(1)),
      salt: String = ""
  ): DataFrame = {
    // the user→arm ledger is read twice (arm totals + the conversion
    // join); checkpoint it so the distinct-shuffle over the event log
    // runs once, not per consumer
    val variants = Sampling.withSplitId(
      events.select(col(userCol)).distinct(), userCol,
      fractions = Seq(0.5, 0.5), salt = salt, splitCol = "variant")
      .select(col(userCol), col("variant"))
      .localCheckpoint(true)

    val arms = variants.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))

    val conv = events.groupBy(col(metricCol), col(userCol))
      .agg(perUserAgg.as("metric_value"))
      .filter(converted)
      .join(variants, userCol)
      .groupBy(metricCol)
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c_b"))

    val big = (x: Column) => x.cast("decimal(38,0)")
    val a = big(col("c_a") * col("n_b") - col("c_b") * col("n_a"))
    val bigN = big(col("n_a") + col("n_b"))
    val c = big(col("c_a") + col("c_b"))
    conv.crossJoin(arms)
      .select(col(metricCol), col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        when(col("n_a") > 0, expr("c_a * 10000 DIV n_a")).otherwise(0L)
          .cast("long").as("conv_a_pm"),
        when(col("n_b") > 0, expr("c_b * 10000 DIV n_b")).otherwise(0L)
          .cast("long").as("conv_b_pm"),
        (big(lit(10000L)) * a * a * bigN >
          big(lit(38416L)) * big(col("n_a")) * big(col("n_b")) * c * (bigN - c))
          .as("significant"))
      .orderBy(metricCol)
  }

  /** CUPED variance-reduced readout (Deng et al., WSDM'13): the post-period
    * metric Y is adjusted by the pre-period covariate X of the SAME unit,
    * Y' = Y − θ·(X − E[X]) with θ = cov(X,Y)/var(X), which strips the
    * between-user variance X explains from the treatment comparison without
    * biasing it (assignment is independent of the pre-period).
    *
    * Exactness: X and Y are integer per-user counts, so every moment the
    * estimator needs is an exact integer —
    *     covN = n·Σxy − Σx·Σy      (= n²·cov_pop)
    *     varxN = n·Σx² − (Σx)²     (= n²·var_pop)
    * and θ, the adjusted means, and the variance-reduction ratio are exact
    * integer ratios, reported in per-myriad via integral division (both
    * Spark `DIV` and DuckDB `//` truncate toward zero, so negatives agree).
    * All products run in DECIMAL(38,0): the binding term is the
    * variance-reduction numerator 10⁴·covN², so the exactness envelope is
    * |covN| ≤ 1.8×10¹⁷ — holds through ~10⁵ users at per-user counts ≤ 10³
    * (then the adjusted-mean terms are ≤ 10³⁵ too); beyond it decimal
    * overflow throws loudly, never rounds. Preconditions: var(X) > 0 and
    * var(Y) > 0 (a constant covariate has no θ; both engines fail the
    * division rather than agreeing on a fiction).
    *
    * Adjusted per-variant mean, fully rational:
    *     mean_v(Y') = [Σy_v·varxN·n − covN·(Σx_v·n − Σx·n_v)]
    *                  / (n_v·varxN·n)
    * Variance reduction = ρ² = covN² / (varxN·varyN) (the CUPED guarantee:
    * var(Y') = (1−ρ²)·var(Y)).
    *
    * Scale shape: ONE aggregation over the event log to the per-user
    * (x, y) ledger (map-side combined), then a 1-row moments frame and a
    * 2-row arms frame — the cross joins are scalar, never data-sized.
    */
  def cupedReadout(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      cutoff: Column,
      salt: String = ""
  ): DataFrame = {
    val big = (x: Column) => x.cast("decimal(38,0)")
    // per-user pre/post counts in one pass; users active only pre (y=0)
    // or only post (x=0) stay in the frame — dropping them would couple
    // membership to the metric and bias the readout
    val perUser = events.groupBy(col(userCol)).agg(
      sum(when(col(tsCol) < cutoff, 1L).otherwise(0L)).as("x"),
      sum(when(col(tsCol) >= cutoff, 1L).otherwise(0L)).as("y"))
    val ledger = Sampling.withSplitId(perUser, userCol,
        fractions = Seq(0.5, 0.5), salt = salt, splitCol = "variant")
      .localCheckpoint(true) // feeds moments AND arms; one event-log scan

    val moments = ledger.agg(
      big(count(lit(1))).as("n"),
      big(sum(col("x"))).as("sx"), big(sum(col("y"))).as("sy"),
      big(sum(col("x") * col("x"))).as("sxx"),
      big(sum(col("x") * col("y"))).as("sxy"),
      big(sum(col("y") * col("y"))).as("syy"))

    val arms = ledger.groupBy(col("variant")).agg(
      count(lit(1)).as("n_v"),
      sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"))

    arms.crossJoin(moments)
      .withColumn("covn", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("varxn", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("varyn", col("n") * col("syy") - col("sy") * col("sy"))
      .withColumn("adj_num", big(lit(10000L)) * (big(col("sum_y")) * col("varxn") * col("n")
        - col("covn") * (big(col("sum_x")) * col("n") - col("sx") * big(col("n_v")))))
      .withColumn("adj_den", big(col("n_v")) * col("varxn") * col("n"))
      .select(col("variant"), col("n_v"), col("sum_x"), col("sum_y"),
        expr("CAST(sum_y AS DECIMAL(38,0)) * 10000 DIV n_v").as("mean_y_pm"),
        expr("adj_num DIV adj_den").as("mean_y_adj_pm"),
        expr("10000 * covn DIV varxn").as("theta_pm"),
        expr("10000 * covn * covn DIV (varxn * varyn)").as("var_reduction_pm"))
      .orderBy("variant")
  }

  /** SAMPLE-RATIO-MISMATCH guard: the first thing a trustworthy experiment
    * system checks. Per calendar day of the experiment, counts the DISTINCT
    * units first seen in each arm that day (arrival accounting — a unit
    * counts once, on its first active day, so a mid-experiment assignment
    * bug shows up on the day it starts) and flags days whose split strays
    * from 50/50 at χ²₁ > 3.8416: with two equal-expectation cells the
    * statistic collapses to (n_a−n_b)²/N, so the verdict is the integer
    * cross-product test 10000·(n_a−n_b)² > 38416·N — engine-exact.
    *
    * Scale shape: one per-user min-date aggregate (map-side combined) on
    * top of the assignment projection, then a days-sized frame. */
  def srmDaily(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      salt: String = ""
  ): DataFrame =
    srmFromLedger(firstSeenLedger(events, userCol, tsCol, salt))

  /** The stateful half of [[srmDaily]]: per (unit, variant) the first
    * active day — ONE aggregation keyed on the unit, so it runs
    * unchanged under Structured Streaming (the state store keeps the
    * running min per unit; StreamingSpec pins the twin). Day travels as
    * a 'yyyy-MM-dd' string: calendar keys are engine-portable as text
    * and lexicographic order IS calendar order. */
  def firstSeenLedger(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      salt: String = ""
  ): DataFrame =
    Sampling.withSplitId(
        events.select(col(userCol), date_format(col(tsCol), "yyyy-MM-dd").as("d")),
        userCol, fractions = Seq(0.5, 0.5), splitCol = "variant", salt = salt)
      .groupBy(col(userCol), col("variant")).agg(min(col("d")).as("first_day"))

  /** The stateless finish: roll the ledger up to per-day arm counts and
    * apply the integer χ² test (days-sized frame). */
  def srmFromLedger(ledger: DataFrame): DataFrame =
    ledger.groupBy(col("first_day"))
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("srm",
        lit(10000L) * (col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) >
          lit(38416L) * (col("n_a") + col("n_b")))
      .orderBy("first_day")
}
