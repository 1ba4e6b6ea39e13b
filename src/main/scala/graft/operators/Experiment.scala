package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    val big = (x: Column) => x.cast("decimal(38,0)")
    val a = big(col("c_a") * col("n_b") - col("c_b") * col("n_a"))
    val bigN = big(col("n_a") + col("n_b"))
    val c = big(col("c_a") + col("c_b"))
    convArms(events, userCol, metricCol, converted, perUserAgg, salt)
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

  /** Shared counts frame of the proportion-test family: per metric, arm
    * sizes and converter counts (`metricCol, c_a, c_b, n_a, n_b`). The
    * user→arm ledger is read twice (arm totals + the conversion join);
    * it is checkpointed so the distinct-shuffle over the event log runs
    * once, not per consumer. */
  private def convArms(
      events: DataFrame,
      userCol: String,
      metricCol: String,
      converted: Column,
      perUserAgg: Column,
      salt: String
  ): DataFrame = {
    val variants = Sampling.withSplitId(
      events.select(col(userCol)).distinct(), userCol,
      fractions = Seq(0.5, 0.5), salt = salt, splitCol = "variant")
      .select(col(userCol), col("variant"))
      .localCheckpoint(true)

    val arms = variants.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))

    events.groupBy(col(metricCol), col(userCol))
      .agg(perUserAgg.as("metric_value"))
      .filter(converted)
      .join(variants, userCol)
      .groupBy(metricCol)
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c_b"))
      .crossJoin(arms)
  }

  /** BENJAMINI–HOCHBERG STEP-UP over the metric family — the
    * multiple-testing correction [[abReadout]]'s per-metric verdicts
    * need before anyone ships a launch decision off "1 of 12 metrics
    * moved": controls the false-discovery rate at α across the m
    * simultaneous proportion tests.
    *
    * Works entirely on integer-exact z² proxies: per metric,
    *
    *     z2_ppm = 10⁶·a²·N DIV (n_a·n_b·c·(N−c)),  a = c_a·n_b − c_b·n_a
    *
    * (monotone in the p-value, so ranking z² DESC ranks p ASC — no
    * p-value is ever computed). Rank i compares against the PINNED χ²₁
    * critical value for α·i/m (`critsPpm(i−1)`, engine-independent
    * constants); BH rejects ranks 1..k where k is the LARGEST rank
    * whose z² clears its own bar. Ranking ties break on metric name, so
    * the readout is total-ordered and replayable.
    *
    * The rank window runs over the METRIC-FAMILY frame (m rows — a
    * domain frame, never data-sized). `critsPpm` must cover m ranks:
    * under ANSI, `element_at` past the end throws loudly rather than
    * silently skipping the correction.
    *
    * @param critsPpm χ²₁ critical values ×10⁶ for p = α·i/m, i = 1..m —
    *                 e.g. α = 0.05, m = 5: Seq(6634897, 5411894,
    *                 4709292, 4217885, 3841459)
    * @return per metric: metric, c_a, n_a, c_b, n_b, z2_ppm, p_rank,
    *         crit_ppm, reject
    */
  def bhStepUp(
      events: DataFrame,
      userCol: String,
      metricCol: String,
      converted: Column,
      critsPpm: Seq[Long],
      perUserAgg: Column = count(lit(1)),
      salt: String = ""
  ): DataFrame = {
    val z2 = convArms(events, userCol, metricCol, converted, perUserAgg, salt)
      .withColumn("z2_ppm", expr(
        """CASE WHEN (c_a + c_b) > 0 AND (c_a + c_b) < (n_a + n_b)
          |THEN (1000000 * CAST(c_a * n_b - c_b * n_a AS DECIMAL(38,0))
          |              * CAST(c_a * n_b - c_b * n_a AS DECIMAL(38,0))
          |              * (n_a + n_b))
          |  DIV (CAST(n_a AS DECIMAL(38,0)) * n_b * (c_a + c_b)
          |       * ((n_a + n_b) - (c_a + c_b)))
          |ELSE 0 END""".stripMargin))
    bhFinish(z2, metricCol, critsPpm)
      .select(col(metricCol), col("c_a"), col("n_a"), col("c_b"), col("n_b"),
        col("z2_ppm"), col("p_rank"), col("crit_ppm"), col("reject"))
      .orderBy("p_rank")
  }

  /** The BH step-up mechanics over an already-computed `(metric,
    * z2_ppm)` frame (bring your own test statistic — any z²-monotone
    * proxy works). Appends `p_rank`, `crit_ppm`, `reject`, keeping
    * every input column. See [[bhStepUp]] for semantics. */
  def bhFinish(perMetric: DataFrame, metricCol: String, critsPpm: Seq[Long]): DataFrame = {
    require(critsPpm.nonEmpty && critsPpm == critsPpm.sorted.reverse,
      s"critsPpm must be non-empty and non-increasing, got $critsPpm")
    val w = Window.orderBy(col("z2_ppm").desc, col(metricCol))
    val ranked = perMetric
      .withColumn("p_rank", row_number().over(w).cast("long"))
      .withColumn("crit_ppm",
        element_at(typedLit(critsPpm), col("p_rank").cast("int")))
      .withColumn("cleared", col("z2_ppm") >= col("crit_ppm"))
      .localCheckpoint(true) // m-row frame, read twice (k_max + verdicts)
    val kMax = ranked.agg(
      max(when(col("cleared"), col("p_rank"))).as("k_max"))
    ranked.crossJoin(kMax)
      .withColumn("reject",
        col("k_max").isNotNull && col("p_rank") <= col("k_max"))
      .drop("cleared", "k_max")
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

  /** QUANTILE TREATMENT EFFECTS: mean effects (q109/CUPED) miss
    * distributional change — a treatment that helps the median user but
    * hurts the tail shows ΔQ(p) of opposite signs across p. Per-arm
    * EXACT type-1 (inverse-ECDF) quantiles of an integer per-unit
    * metric, Q(p) = the value at rank ⌈p·n⌉, computed with the q129
    * counting-sort discipline: one (variant, value) count aggregate
    * (map-side combined, state = O(distinct values)), a per-arm window
    * over the VALUE-DOMAIN frame, then rank lookups for every requested
    * p — no per-row sort, no interpolation, every output a long.
    *
    * @param ps quantiles as exact rationals (num, den), e.g. (1,2) for
    *           the median — ranks are ⌈num·n/den⌉ in integer arithmetic
    * @return one row per p: p_pm, n_a, n_b, q_a, q_b, qte = q_b − q_a */
  def quantileEffects(
      events: DataFrame,
      userCol: String,
      ps: Seq[(Int, Int)],
      perUserAgg: Column = count(lit(1)),
      salt: String = ""
  ): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (n, d) => n > 0 && n <= d },
      s"bad quantile list $ps")
    // p_pm labels the output AND keys the rank grouping — two requested
    // quantiles colliding at the same per-myriad value would silently
    // merge into one wrong row
    require(ps.map { case (n, d) => n * 10000 / d }.distinct.size == ps.size,
      s"quantile labels collide at per-myriad precision: $ps")
    val perUser = events.groupBy(col(userCol)).agg(perUserAgg.cast("long").as("y"))
    val ledger = Sampling.withSplitId(perUser, userCol,
      fractions = Seq(0.5, 0.5), salt = salt, splitCol = "variant")
    val counts = ledger.groupBy(col("variant"), col("y"))
      .agg(count(lit(1)).as("cnt"))
    val byV = Window.partitionBy(col("variant"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(
        byV.orderBy(col("y")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(byV))
    // requested ranks as a literal frame crossed onto the domain frame
    val pFrame = ps.map { case (num, den) =>
      s"SELECT ${num * 10000 / den}L AS p_pm, ${num}L AS p_num, ${den}L AS p_den"
    }.mkString(" UNION ALL ")
    val withP = cum.crossJoin(cum.sparkSession.sql(pFrame)) // |ps|-row scalar
      .withColumn("rank", expr("(p_num * n + p_den - 1) DIV p_den"))
    withP.groupBy(col("p_pm"))
      .agg(
        max(when(col("variant") === 0, col("n"))).as("n_a"),
        max(when(col("variant") === 1, col("n"))).as("n_b"),
        min(when(col("variant") === 0 && col("cum") >= col("rank"), col("y"))).as("q_a"),
        min(when(col("variant") === 1 && col("cum") >= col("rank"), col("y"))).as("q_b"))
      .withColumn("qte", col("q_b") - col("q_a"))
      .orderBy(col("p_pm"))
  }

  /** DIFFERENCE-IN-DIFFERENCES: the 2×2 (arm × period) readout —
    * DiD = (post_b − pre_b) − (post_a − pre_a) on per-unit mean counts,
    * the estimator of record when assignment is NOT randomized (a
    * rollout, a geo launch) and arms carry level differences the
    * pre-period must absorb. Shares [[cupedReadout]]'s per-user (x, y)
    * ledger; every cell mean is an exact integer ratio over the arm
    * size, and the headline effect is cross-multiplied to one
    * truncating division:
    *     did_pm = 10⁴·[(Σy_b−Σx_b)·n_a − (Σy_a−Σx_a)·n_b] DIV (n_a·n_b)
    * Scale shape: identical to CUPED — one event-log aggregation, then
    * 2-row frames. */
  def didReadout(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      cutoff: Column,
      salt: String = ""
  ): DataFrame = {
    val perUser = events.groupBy(col(userCol)).agg(
      sum(when(col(tsCol) < cutoff, 1L).otherwise(0L)).as("x"),
      sum(when(col(tsCol) >= cutoff, 1L).otherwise(0L)).as("y"))
    val arms = Sampling.withSplitId(perUser, userCol,
        fractions = Seq(0.5, 0.5), salt = salt, splitCol = "variant")
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_v"),
        sum(col("x")).as("sum_pre"), sum(col("y")).as("sum_post"))
    val a = arms.filter(col("variant") === 0)
      .select(col("n_v").as("n_a"), col("sum_pre").as("pre_a"),
        col("sum_post").as("post_a"))
    val b = arms.filter(col("variant") === 1)
      .select(col("n_v").as("n_b"), col("sum_pre").as("pre_b"),
        col("sum_post").as("post_b"))
    a.crossJoin(b) // 1-row × 1-row
      .select(col("n_a"), col("n_b"),
        expr("pre_a * 10000 DIV n_a").as("pre_a_pm"),
        expr("post_a * 10000 DIV n_a").as("post_a_pm"),
        expr("pre_b * 10000 DIV n_b").as("pre_b_pm"),
        expr("post_b * 10000 DIV n_b").as("post_b_pm"),
        expr("CAST(10000 AS DECIMAL(38,0)) * ((post_b - pre_b) * n_a"
          + " - (post_a - pre_a) * n_b) DIV (n_a * n_b)").as("did_pm"))
  }

  /** WINSORIZED EXPERIMENT READOUT: per-arm means of the per-unit metric
    * CLAMPED at pooled type-1 quantile cut points — the robust metric
    * that keeps one whale from deciding an experiment (the classic
    * failure of raw revenue/activity means). Cut points are computed on
    * the POOLED distribution (q129 counting-sort discipline — a
    * value-domain frame, no data-sized sort) and applied identically to
    * both arms: per-arm cuts would distort the very comparison being
    * made. Everything stays exact integers: cuts are order statistics,
    * clamped sums are integer sums, and the means are truncating
    * per-myriad divisions.
    *
    * @param loNum/loDen, hiNum/hiDen clamp quantiles as exact rationals
    *        (e.g. 1/20 and 19/20 for 5%/95% winsorization) */
  def winsorizedReadout(
      events: DataFrame,
      userCol: String,
      loNum: Int, loDen: Int,
      hiNum: Int, hiDen: Int,
      perUserAgg: Column = count(lit(1)),
      salt: String = ""
  ): DataFrame = {
    require(loNum >= 0 && hiNum * loDen > loNum * hiDen && hiNum <= hiDen,
      s"need 0 <= lo < hi <= 1, got $loNum/$loDen, $hiNum/$hiDen")
    val perUser = events.groupBy(col(userCol)).agg(perUserAgg.cast("long").as("y"))
    val ledger = Sampling.withSplitId(perUser, userCol,
        fractions = Seq(0.5, 0.5), salt = salt, splitCol = "variant")
      .localCheckpoint(true) // cut points + clamped means, one scan
    // pooled cut points off the value-domain frame
    val cum = ledger.groupBy(col("y")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("y"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(ledger.agg(count(lit(1)).as("n_all")))
    val cuts = cum.agg(
      min(when(col("cum") >= expr(s"($loNum * n_all + $loDen - 1) DIV $loDen"),
        col("y"))).as("lo_cut"),
      min(when(col("cum") >= expr(s"($hiNum * n_all + $hiDen - 1) DIV $hiDen"),
        col("y"))).as("hi_cut"))
    ledger.crossJoin(cuts) // 1-row scalar
      .withColumn("yw", greatest(col("lo_cut"), least(col("hi_cut"), col("y"))))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_v"),
        sum(col("y")).as("sum_y"), sum(col("yw")).as("sum_yw"),
        sum(when(col("y") =!= col("yw"), 1L).otherwise(0L)).as("n_clamped"),
        max(col("lo_cut")).as("lo_cut"), max(col("hi_cut")).as("hi_cut"))
      .withColumn("mean_y_pm", expr("sum_y * 10000 DIV n_v"))
      .withColumn("mean_w_pm", expr("sum_yw * 10000 DIV n_v"))
      .orderBy(col("variant"))
  }

  /** SEQUENTIAL PROBABILITY RATIO TEST (Wald '45) on a daily unit
    * stream: the readout a team peeking at an experiment every day
    * should use instead of repeating fixed-horizon z-tests (which
    * inflates false positives). Each unit contributes a pinned
    * MICRO-NAT log-likelihood increment — ln(p1/p0) when converted,
    * ln((1−p1)/(1−p0)) when not, both caller-pinned integers — and the
    * cumulative LLR decides the first day it leaves (−b, a):
    * ≥ a ⇒ accept H1, ≤ −b ⇒ accept H0 (a = b = ln 19 ≈ 2944439 µnats
    * gives α ≈ β ≈ 0.05). Everything after the per-day unit aggregate
    * is a days-sized frame; the cumulative sum is exact integer
    * arithmetic, so the decision DAY is engine-exact — no float drift
    * can move a boundary crossing.
    *
    * Output per day (calendar order): n units, c conversions, the day's
    * LLR, the running LLR, and the decision state carried FORWARD (once
    * a boundary is crossed the test is over; later days report the
    * sealed verdict).
    *
    * @param convertedUnit per-(day, unit) aggregate predicate exposed as
    *        `metric_value` (like [[abReadout]]'s `converted`)
    * @param upMicro   per-converted-unit increment, µnats (ln(p1/p0))
    * @param downMicro per-unconverted-unit increment, µnats
    *                  (ln((1−p1)/(1−p0)), negative)
    * @param aMicro    H1 acceptance boundary (positive µnats)
    * @param bMicro    H0 acceptance boundary (positive µnats) */
  def sprtDaily(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      convertedUnit: Column,
      upMicro: Long,
      downMicro: Long,
      aMicro: Long = 2944439L,
      bMicro: Long = 2944439L
  ): DataFrame = {
    require(upMicro > 0 && downMicro < 0 && aMicro > 0 && bMicro > 0,
      "increments must move the LLR in opposite directions; boundaries positive")
    val units = events
      .select(date_format(col(tsCol), "yyyy-MM-dd").as("day"),
        col(userCol).as("u"))
      .groupBy(col("day"), col("u")).agg(count(lit(1)).as("metric_value"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(convertedUnit, 1L).otherwise(0L)).as("c"))
    val byDay = Window.orderBy(col("day")) // days-sized frame
    units
      .withColumn("llr_day_micro",
        col("c") * upMicro + (col("n") - col("c")) * downMicro)
      .withColumn("llr_cum_micro",
        sum(col("llr_day_micro")).over(
          byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // the decision seals at the FIRST crossing: carry the earliest
      // crossing day's verdict forward via running min/max
      .withColumn("_hi", max(col("llr_cum_micro")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_lo", min(col("llr_cum_micro")).over(
        byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("decision",
        when(col("_hi") >= aMicro && col("_lo") <= -bMicro,
          // both boundaries touched: the earlier crossing wins — find it
          // by comparing the first days each boundary was reached
          when(min(when(col("llr_cum_micro") >= aMicro, col("day"))).over(byDay
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)) <=
            min(when(col("llr_cum_micro") <= -bMicro, col("day"))).over(byDay
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            lit("accept_h1")).otherwise(lit("accept_h0")))
          .when(col("_hi") >= aMicro, lit("accept_h1"))
          .when(col("_lo") <= -bMicro, lit("accept_h0"))
          .otherwise(lit("continue")))
      .select("day", "n", "c", "llr_day_micro", "llr_cum_micro", "decision")
      .orderBy("day")
  }

  /** A/A CALIBRATION — the experiment platform's self-check: run the
    * [[abReadout]] proportion test over MANY null splits of the SAME
    * data (different salts, no real treatment anywhere) and count how
    * often it cries "significant". A healthy α=.05 test fires on ≈5%
    * of (salt, metric) cells; materially more means the assignment
    * hash, the variance model, or the independence assumption is broken
    * — the standard pre-flight before trusting any real readout.
    *
    * Scale shape: the two event-log passes (distinct users; per-user
    * conversion) are paid ONCE and checkpointed; each salt then costs
    * only a projection over the user ledger plus a converter-ledger
    * join — salts × (users-sized join), never salts × (events-sized
    * scan). The readout frame is (salts × metrics)-sized.
    *
    * @return per (salt, metric): arm/converter counts and the q109
    *         significance verdict, plus family-wide n_tests,
    *         n_false_pos, fp_pm on every row (the crossJoin-summary
    *         convention) — ordered by (salt, metric)
    */
  def aaCalibration(
      events: DataFrame,
      userCol: String,
      metricCol: String,
      converted: Column,
      perUserAgg: Column = count(lit(1)),
      salts: Seq[String]
  ): DataFrame = {
    require(salts.nonEmpty, "need at least one A/A salt")
    val users = events.select(col(userCol)).distinct().localCheckpoint(true)
    val conv = events.groupBy(col(metricCol), col(userCol))
      .agg(perUserAgg.as("metric_value"))
      .filter(converted)
      .select(col(metricCol), col(userCol))
      .localCheckpoint(true) // the heavy pass, shared by every salt
    val cells = salts.map { s =>
      val variants = Sampling.withSplitId(users, userCol,
          fractions = Seq(0.5, 0.5), salt = s, splitCol = "variant")
        .select(col(userCol), col("variant"))
      val arms = variants.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"))
      conv.join(variants, userCol)
        .groupBy(col(metricCol))
        .agg(
          sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c_a"),
          sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c_b"))
        .crossJoin(arms)
        .withColumn("salt", lit(s))
    }.reduce(_ unionByName _)
    val big = (x: Column) => x.cast("decimal(38,0)")
    val a = big(col("c_a") * col("n_b") - col("c_b") * col("n_a"))
    val bigN = big(col("n_a") + col("n_b"))
    val c = big(col("c_a") + col("c_b"))
    val flagged = cells.withColumn("significant",
      big(lit(10000L)) * a * a * bigN >
        big(lit(38416L)) * big(col("n_a")) * big(col("n_b")) * c * (bigN - c))
    val summary = flagged.agg(
      count(lit(1)).as("n_tests"),
      sum(when(col("significant"), 1L).otherwise(0L)).as("n_false_pos"))
      .withColumn("fp_pm", expr("(10000 * n_false_pos) DIV n_tests"))
    flagged
      .select(col("salt"), col(metricCol), col("n_a"), col("c_a"),
        col("n_b"), col("c_b"), col("significant"))
      .crossJoin(summary)
      .orderBy("salt", metricCol)
  }

  /** POWER ANALYSIS / MINIMUM DETECTABLE EFFECT — the design-time
    * counterpart of [[abReadout]]: BEFORE running a test, what absolute
    * lift could this metric's current audience even detect, and how many
    * users per arm would a target relative lift need? The standard
    * two-proportion approximation at α = .05 (two-sided) and 80% power:
    *
    *     MDE      = (z_{α/2} + z_β) · sqrt(2·p·(1−p)/n_arm)
    *     n_needed = (z_{α/2} + z_β)² · 2·p·(1−p) / δ²
    *
    * with z_{α/2} + z_β = 1.9600 + 0.8416 pinned as the integer 28016
    * (×10⁻⁴) — the same pinned-constant discipline as [[abReadout]]'s
    * 1.96² = 38416.
    *
    * Exactness: everything is cross-multiplied into DECIMAL(38,0)
    * integers; the single irrational step is one sqrt on a DOUBLE —
    * IEEE-754 requires sqrt correctly rounded, and both engines convert
    * the same integer to the same double, so floor(sqrt(…)) is
    * bit-identical (the q214 jackknife-SE construction). n_needed uses
    * ceiling division — under-powering by rounding down would be the
    * one direction a design tool must never err.
    *
    * Scale shape: one distinct-user aggregate per metric (the same
    * expand a conversion readout already pays), then arithmetic on the
    * metrics-sized frame. No joins, no windows.
    *
    * @param converted row-level conversion predicate (a user converts
    *                  if ANY of their rows under the metric satisfies it)
    * @param relPm     target relative lifts in per-myriad of baseline
    *                  (200 = detect a 2% relative change)
    * @return per metric: n_users, conv_users, p_pm, n_arm, mde_pm,
    *         and one n_need_rel<r> column per requested lift
    */
  def powerReadout(
      events: DataFrame,
      userCol: String,
      metricCol: String,
      converted: Column,
      relPm: Seq[Long] = Seq(200L, 500L)
  ): DataFrame = {
    require(relPm.nonEmpty, "need at least one target relative lift")
    val z2 = 28016L * 28016L // (1.96 + 0.8416)² in 1e-8 units
    val counts = events
      .groupBy(col(metricCol).as("metric"))
      .agg(count_distinct(col(userCol)).as("n_users"),
        count_distinct(when(converted, col(userCol))).as("conv_users"))
      .withColumn("p_pm", expr("(10000 * conv_users) DIV n_users"))
      .withColumn("n_arm", expr("n_users DIV 2"))
      .withColumn("_num",
        (lit(z2).cast("decimal(38,0)") * 2 * col("p_pm")
          * (lit(10000L) - col("p_pm"))).cast("decimal(38,0)"))
      .withColumn("mde_pm",
        when(col("n_arm") > 0 && col("p_pm") > 0,
          expr("CAST(floor(sqrt(CAST(_num DIV n_arm AS DOUBLE))) AS BIGINT) DIV 10000")))
    val withNeeds = relPm.foldLeft(counts) { (acc, r) =>
      acc.withColumn(s"n_need_rel$r",
        when(col("p_pm") > 0 && expr(s"($r * p_pm) DIV 10000") > 0,
          expr(s"""(_num + 100000000 * (($r * p_pm) DIV 10000)
                  |  * (($r * p_pm) DIV 10000) - 1)
                  | DIV (100000000 * (($r * p_pm) DIV 10000)
                  |  * (($r * p_pm) DIV 10000))""".stripMargin.replace("\n", " "))
            .cast("long")))
    }
    withNeeds
      .select(Seq(col("metric"), col("n_users"), col("conv_users"),
        col("p_pm"), col("n_arm"), col("mde_pm")) ++
        relPm.map(r => col(s"n_need_rel$r")): _*)
      .orderBy("metric")
  }

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
