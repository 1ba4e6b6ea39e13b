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
}
