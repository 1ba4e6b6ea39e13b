package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** DATA VALUATION — which slice of the corpus is pulling a metric up,
  * and which is dragging it down?
  *
  * The leave-one-group-out (LOO) readout answers it exactly and in ONE
  * aggregate: per group g, the metric's mean over everything EXCEPT g is
  * just (S − S_g)/(n − n_g) — sufficient statistics, no per-group
  * re-scan, no resampling. The sign convention makes the table
  * actionable: contribution > 0 means removing the group would LOWER
  * the global mean (the group helps); < 0 means removing it would raise
  * the mean (the group hurts — the first candidate for a curation cut).
  *
  * Everything is integer-exact ([[Experiment]] discipline): means in
  * micro-units via one truncating DIV each, DECIMAL(38,0) products, so
  * the valuation is bit-identical across engines. Scale shape: one
  * map-side-combined groupBy onto the group frame; the global totals
  * come from that frame, not a second scan.
  */
object Valuation {

  /** @param df       rows carrying an integral metric
    * @param groupCol the slice key (source, lang, shard, …)
    * @param valueCol integral per-row metric (a score in micros, a
    *                 token count, …)
    * @return per group: group, n, share_pm (group's row share),
    *         mean_micro (group's own mean ×10⁶), loo_mean_micro (the
    *         global mean without the group), contribution_micro
    *         (global mean − LOO mean); global_mean_micro repeated via
    *         a 1-row scalar cross-join. Groups covering the whole
    *         input report NULL loo/contribution (no complement).
    */
  def leaveOneOut(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val grp = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(valueCol).cast("long")).cast("decimal(38,0)").as("s"))
      .localCheckpoint(true) // totals + per-group readout: one shuffle
    val tot = grp.agg(sum(col("n")).cast("long").as("nn"),
      sum(col("s")).cast("decimal(38,0)").as("ss"))
    grp.crossJoin(tot)
      .withColumn("share_pm", expr("(1000 * CAST(n AS DECIMAL(38,0))) DIV nn"))
      .withColumn("mean_micro", expr("(1000000 * s) DIV n"))
      .withColumn("global_mean_micro", expr("(1000000 * ss) DIV nn"))
      .withColumn("loo_mean_micro", expr(
        "CASE WHEN nn > n THEN (1000000 * (ss - s)) DIV (nn - n) END"))
      .withColumn("contribution_micro",
        col("global_mean_micro") - col("loo_mean_micro"))
      .select(col(groupCol), col("n"), col("share_pm"),
        col("mean_micro").cast("long").as("mean_micro"),
        col("loo_mean_micro").cast("long").as("loo_mean_micro"),
        col("contribution_micro").cast("long").as("contribution_micro"),
        col("global_mean_micro").cast("long").as("global_mean_micro"))
      .orderBy(groupCol)
  }

  /** GROUPED (delete-a-bucket) JACKKNIFE standard error of the mean —
    * the second uncertainty method next to [[Bootstrap.meanCi]], and
    * its cross-check: units land in g deterministic md5 buckets (the
    * [[Sampling]] split), the g leave-one-bucket-out means come from
    * the SAME sufficient-stats subtraction as [[leaveOneOut]], and
    *
    *     SE² = (g−1)/g · Σᵢ (m₍ᵢ₎ − m̄)²
    *         = (g−1)·(g·Σm² − (Σm)²) DIV g²        (exact, micro²)
    *
    * with the m₍ᵢ₎ already integer micro-means. se_micro finishes with
    * one IEEE sqrt on the exact integer (the centroid-cosine
    * discipline — correctly rounded, floor-quantized; the q70 boundary
    * caveat applies to this last step only). A healthy pairing with the
    * bootstrap reads CI half-width ≈ 1.96·se.
    *
    * One bucket-keyed aggregate over the units; everything after runs
    * on the g-row frame.
    *
    * @param g    bucket count (≥ 2; 10000 must divide evenly so the
    *             md5 per-myriad split is exact)
    * @return 1 row: g, n_units, mean_micro, se2_micro2 (exact),
    *         se_micro
    */
  def groupedJackknife(df: DataFrame, keyCol: String, valueCol: String,
      g: Int, salt: String = ""): DataFrame = {
    require(g >= 2 && 10000 % g == 0, s"g must be >= 2 and divide 10000, got $g")
    val bucketed = Sampling.withSplitId(
      df.select(col(keyCol), col(valueCol).cast("long").as("v")),
      keyCol, fractions = Seq.fill(g)(1.0 / g), salt = salt, splitCol = "bkt")
    val grp = bucketed.groupBy("bkt")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("decimal(38,0)").as("s"))
      .localCheckpoint(true) // totals + LOO means: one shuffle
    val tot = grp.agg(sum(col("n")).cast("long").as("nn"),
      sum(col("s")).cast("decimal(38,0)").as("ss"),
      count(lit(1)).cast("long").as("gg"))
    val loo = grp.crossJoin(tot)
      .withColumn("m", expr(
        "CASE WHEN nn > n THEN (1000000 * (ss - s)) DIV (nn - n) END"))
      .filter(col("m").isNotNull)
    loo.agg(max(col("gg")).as("g"), max(col("nn")).as("n_units"),
        max(expr("(1000000 * ss) DIV nn")).as("mean_micro"),
        sum(big(col("m"))).as("sm"),
        sum(big(col("m")) * col("m")).as("sm2"))
      .withColumn("se2_micro2", expr(
        """((g - 1) * (CAST(g AS DECIMAL(38,0)) * sm2 - sm * sm))
          |DIV (CAST(g AS DECIMAL(38,0)) * g)""".stripMargin))
      .select(col("g"), col("n_units"),
        col("mean_micro").cast("long").as("mean_micro"),
        col("se2_micro2").cast("long").as("se2_micro2"),
        expr("CAST(floor(sqrt(CAST(se2_micro2 AS DOUBLE))) AS BIGINT)")
          .as("se_micro"))
  }

  private def big(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(38,0)")

  /** GROWTH ACCOUNTING — period-over-period revenue change decomposed
    * through the identity R = U · (O/U) · (R/O) into the three levers
    * every growth review argues about: more users, more transactions
    * per user, or bigger transactions. Stepwise substitution in the
    * PINNED order users → frequency → value:
    *
    *     d_users = ((U₂−U₁)·R₁) DIV U₁
    *     d_freq  = (R₁·O₂) DIV O₁ − (R₁·U₂) DIV U₁
    *     d_value = R₂ − (R₁·O₂) DIV O₁
    *
    * which telescopes to exactly ΔR before truncation; the reported
    * `residual` is the truncation dust (|residual| ≤ 3 by
    * construction) — the readout carries its own error bar instead of
    * silently absorbing it. Substitution order is part of the defined
    * semantics (a different order attributes interaction terms
    * differently; this one charges them to the later lever).
    *
    * Scale shape: input is the ALREADY-AGGREGATED per-period frame
    * (period, units, transactions, value) — one lag window over a
    * calendar-bounded frame. The raw scan happened upstream.
    */
  def growthAccounting(periods: DataFrame, periodCol: String,
      unitsCol: String, txCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("period"))
    periods.select(col(periodCol).as("period"),
        col(unitsCol).cast("long").as("u2"),
        col(txCol).cast("long").as("o2"),
        col(valueCol).cast("long").as("r2"))
      .withColumn("u1", lag(col("u2"), 1).over(w))
      .withColumn("o1", lag(col("o2"), 1).over(w))
      .withColumn("r1", lag(col("r2"), 1).over(w))
      .filter(col("u1").isNotNull && col("u1") > 0 && col("o1") > 0)
      .withColumn("delta", col("r2") - col("r1"))
      .withColumn("d_users", expr("((u2 - u1) * r1) DIV u1"))
      .withColumn("d_freq",
        expr("(r1 * o2) DIV o1 - (r1 * u2) DIV u1"))
      .withColumn("d_value", expr("r2 - (r1 * o2) DIV o1"))
      .withColumn("residual",
        expr("delta - d_users - d_freq - d_value"))
      .select(col("period"), col("u1"), col("u2"), col("o1"), col("o2"),
        col("r1"), col("r2"), col("delta"), col("d_users"), col("d_freq"),
        col("d_value"), col("residual"))
      .orderBy("period")
  }
}
