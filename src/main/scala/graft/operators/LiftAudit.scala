package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCORE LIFT / GAINS TABLE: the standard audit of a ranking model
  * against a binary reference label — equi-width score bands, per-band
  * precision, and top-down cumulative gains with lift vs the base rate.
  * A model with signal shows lift >> 1× in its top bands; a no-signal
  * model reads flat at ~1× everywhere (which is exactly what this table
  * is for: catching a scorer that ranks no better than chance BEFORE it
  * gates a training mix).
  *
  * Banding is scan-side integer arithmetic — band = clamp((score−lo)·B
  * DIV (hi−lo)) — so there is NO rank/sort over the data (a decile table
  * needs a global rank; an equi-width table needs none) and the only
  * aggregation is one map-side-combined groupBy onto ≤B+2 rows. The
  * cumulative window runs on the band frame. Ratios-of-ratios (lift)
  * cross-multiply in DECIMAL(38,0): 10⁴·cum_pos·N DIV (cum_n·POS) —
  * exact at any corpus size.
  *
  * Out-of-range scores clamp into the edge bands (they still count —
  * silently dropping them would bias the base rate).
  */
object LiftAudit {

  /** @param df       scored rows
    * @param scoreCol integral model score
    * @param labelCol boolean reference label
    * @param lo,hi    score range for the B equi-width bands (hi > lo)
    * @param bands    band count (band B−1 holds the highest scores)
    * @return per non-empty band, highest first: band, band_lo, n, n_pos,
    *         prec_pm, cum_n, cum_pos, cum_prec_pm, lift_pm */
  def liftTable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      lo: Long,
      hi: Long,
      bands: Int
  ): DataFrame = {
    require(hi > lo && bands > 0, s"bad band spec [$lo, $hi) x $bands")
    val width = hi - lo
    val band = least(lit(bands - 1L), greatest(lit(0L),
      expr(s"(($scoreCol - (${lo}L)) * $bands) DIV ${width}L")))
    val w = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(band.as("band"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"))
      // totals from the band frame itself (≤B rows) — one data scan
      .withColumn("_nn", sum(col("n")).over(whole))
      .withColumn("_npos", sum(col("n_pos")).over(whole))
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .select(col("band"),
        (lit(lo) + expr(s"(band * ${width}L) DIV $bands")).as("band_lo"),
        col("n"), col("n_pos"),
        expr("n_pos * 10000 DIV n").as("prec_pm"),
        col("cum_n"), col("cum_pos"),
        expr("cum_pos * 10000 DIV cum_n").as("cum_prec_pm"),
        when(col("_npos") > 0,
          expr("CAST(cum_pos AS DECIMAL(38,0)) * _nn * 10000 DIV (cum_n * _npos)"))
          .otherwise(0L).as("lift_pm"))
      .orderBy(col("band").desc)
  }

  /** RELIABILITY / CALIBRATION table + expected calibration error — does
    * a score that CLAIMS to be a probability match observed frequency?
    *
    * Confidence arrives in integer per-mille (0..1000). Bins are
    * equi-width on confidence (bin = min(conf,999) DIV width — scan-side
    * integer arithmetic, no rank); per bin the gap between claimed and
    * observed mass is
    *
    *     gap_pm_n = |1000·pos_b − Σconf_b|
    *
    * — per-mille × count units, EXACT (both terms are plain integer
    * sums), so the ECE weighting by bin mass is just the integer sum of
    * gaps over N:  ece_pm = Σ_b gap_pm_n DIV N. The per-bin display
    * ratios (avg conf, accuracy) use one truncating DIV each.
    *
    * Same scale shape as [[liftTable]]: one map-side-combined groupBy
    * onto ≤⌈1000/width⌉ rows, the scalar ECE crossed back from the bin
    * frame itself.
    *
    * @param df       scored rows
    * @param confPm   integral claimed probability, per-mille 0..1000
    *                 (out-of-range clamps into edge bins — dropping
    *                 would bias the base rate)
    * @param labelCol boolean reference outcome
    * @param widthPm  bin width in per-mille (e.g. 100 → 10 bins)
    * @return per non-empty bin: bin, bin_lo_pm, n, n_pos, conf_sum_pm,
    *         avg_conf_pm, acc_pm, gap_pm_n, plus ece_pm repeated via a
    *         1-row scalar cross-join
    */
  def calibrationReport(
      df: DataFrame,
      confPm: Column,
      labelCol: String,
      widthPm: Int = 100
  ): DataFrame = {
    require(widthPm > 0 && widthPm <= 1000, s"bad bin width $widthPm")
    val clamped = least(lit(999L), greatest(lit(0L), confPm.cast("long")))
    val bins = df
      .select((clamped.cast("long")).as("conf"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy(expr(s"conf DIV $widthPm").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("conf")).as("conf_sum_pm"))
      .withColumn("gap_pm_n", abs(lit(1000L) * col("n_pos") - col("conf_sum_pm")))
    val whole = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    bins
      .withColumn("_nn", sum(col("n")).over(whole))
      .withColumn("_gap", sum(col("gap_pm_n")).over(whole))
      .select(col("bin"), (col("bin") * widthPm).as("bin_lo_pm"),
        col("n"), col("n_pos"), col("conf_sum_pm"),
        expr("conf_sum_pm DIV n").as("avg_conf_pm"),
        expr("(1000 * n_pos) DIV n").as("acc_pm"),
        col("gap_pm_n"),
        expr("_gap DIV _nn").as("ece_pm"))
      .orderBy("bin")
  }

  /** WEIGHT-OF-EVIDENCE / INFORMATION-VALUE table — the scorecard
    * audit: per band b with n⁺/n⁻ positives/negatives and P/N the
    * class totals,
    *
    *     WoE_b = ln((n⁺_b/P)/(n⁻_b/N)) = ln((n⁺_b·N)/(n⁻_b·P))
    *     IV    = Σ_b (n⁺_b/P − n⁻_b/N)·WoE_b
    *
    * quantize-then-sum (the q70 ln construction): WoE in micro-nats
    * per band, each IV term the exact integer product
    * (n⁺·N − n⁻·P)·woe_micro, ONE division by P·N on the summed total.
    * IV terms are ≥ 0 by the shared sign, so iv_micro is monotone in
    * separation — rule of thumb: < 0.02 (20 000 micro) useless,
    * > 0.3 strong. Pure bands (one class absent) have infinite WoE;
    * they are excluded from IV and counted in `n_pure` instead (the
    * standard practical convention, here made explicit and replayable).
    *
    * One count-shuffle onto the band frame; the scalars cross back
    * from it.
    *
    * @return per band: band, n_pos, n_neg, woe_micro, term (NULL for
    *         pure bands) + iv_micro / n_pure / class totals crossed in
    */
  def woeTable(df: DataFrame, bandCol: Column, labelCol: String): DataFrame = {
    val bands = df.select(bandCol.as("band"), col(labelCol).cast("boolean").as("y"))
      .groupBy("band")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("n_neg"))
      .localCheckpoint(true) // totals + terms: one shuffle
    val tot = bands.agg(sum(col("n_pos")).cast("long").as("p"),
      sum(col("n_neg")).cast("long").as("n"))
    val terms = bands.crossJoin(tot)
      .withColumn("woe_micro", expr(
        """CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          |CAST(floor(ln((CAST(n_pos AS DOUBLE) * n) / (CAST(n_neg AS DOUBLE) * p))
          |  * 1e6 + 0.5) AS BIGINT) END""".stripMargin))
      .withColumn("term", expr(
        """CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          |(CAST(n_pos AS DECIMAL(38,0)) * n - CAST(n_neg AS DECIMAL(38,0)) * p)
          |  * woe_micro END""".stripMargin))
    val summary = terms.agg(
        expr("CAST(sum(term) DIV (max(CAST(p AS DECIMAL(38,0))) * max(n)) AS BIGINT)")
          .as("iv_micro"),
        sum(when(col("woe_micro").isNull, 1L).otherwise(0L)).as("n_pure"),
        max(col("p")).as("n_pos_total"), max(col("n")).as("n_neg_total"))
    terms.select(col("band"), col("n_pos"), col("n_neg"),
        col("woe_micro"), col("term").cast("long").as("term"))
      .crossJoin(summary)
      .orderBy("band")
  }

  /** QINI UPLIFT CURVE — the evaluation instrument for uplift models
    * (Radcliffe): rank units by a targeting score, and at each score
    * threshold compare the treated group's conversions against the
    * control group's, scaled to the treated size:
    *
    *     Q(s) = convT(s) − convC(s)·nT(s)/nC(s)
    *
    * against the random-targeting diagonal Q_total·n(s)/N. A score
    * that finds the persuadables bows above the diagonal; the q168
    * lift table cannot see this because it has no control group.
    *
    * Computed at SCORE-GRAIN breakpoints (ties stay together — the
    * exact curve, no arbitrary within-tie decile splits): one
    * (score)-grain aggregate of the unit ledger, then cumulative and
    * total windows over the score-domain frame. qini_milli is one
    * truncating DIV (products in DECIMAL(38,0)); the diagonal nests
    * the already-truncated Q_total, so the truncation order is defined
    * semantics the oracle replays.
    *
    * @param units   one row per unit
    * @param scoreCol targeting score (higher = target first)
    * @param treated unit-level treatment predicate
    * @param conv    unit-level conversion predicate
    * @return per descending score threshold: score, cum_n_t, cum_n_c,
    *         cum_conv_t, cum_conv_c, qini_milli, rand_milli,
    *         excess_milli
    */
  def qiniCurve(units: DataFrame, scoreCol: String, treated: Column,
      conv: Column): DataFrame =
    qiniFromCells(units.groupBy(col(scoreCol).as("score")).agg(
      sum(when(treated, 1L).otherwise(0L)).as("n_t"),
      sum(when(!treated, 1L).otherwise(0L)).as("n_c"),
      sum(when(treated && conv, 1L).otherwise(0L)).as("conv_t"),
      sum(when(!treated && conv, 1L).otherwise(0L)).as("conv_c")))

  /** The stateless Qini finish over pre-aggregated score-grain cells
    * (score, n_t, n_c, conv_t, conv_c) — the mergeable state a
    * streaming ingest maintains (cell sums commute with
    * micro-batching), the [[Drift.ksFromCounts]] pattern. */
  def qiniFromCells(cells: DataFrame): DataFrame = {
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("cum_n_t", sum(col("n_t")).over(wCum))
      .withColumn("cum_n_c", sum(col("n_c")).over(wCum))
      .withColumn("cum_conv_t", sum(col("conv_t")).over(wCum))
      .withColumn("cum_conv_c", sum(col("conv_c")).over(wCum))
      .withColumn("tot_n_t", sum(col("n_t")).over(wAll))
      .withColumn("tot_n_c", sum(col("n_c")).over(wAll))
      .withColumn("tot_conv_t", sum(col("conv_t")).over(wAll))
      .withColumn("tot_conv_c", sum(col("conv_c")).over(wAll))
      .withColumn("qini_milli", expr(
        """CASE WHEN cum_n_c > 0 THEN
          |  (1000 * (CAST(cum_conv_t AS DECIMAL(38,0)) * cum_n_c
          |    - CAST(cum_conv_c AS DECIMAL(38,0)) * cum_n_t)) DIV cum_n_c
          |END""".stripMargin))
      .withColumn("qini_tot_milli", expr(
        """CASE WHEN tot_n_c > 0 THEN
          |  (1000 * (CAST(tot_conv_t AS DECIMAL(38,0)) * tot_n_c
          |    - CAST(tot_conv_c AS DECIMAL(38,0)) * tot_n_t)) DIV tot_n_c
          |END""".stripMargin))
      .withColumn("rand_milli", expr(
        """CASE WHEN tot_n_c > 0 THEN
          |  (qini_tot_milli * (cum_n_t + cum_n_c))
          |    DIV (tot_n_t + tot_n_c) END""".stripMargin))
      .withColumn("excess_milli", expr("qini_milli - rand_milli"))
      .select(col("score"), col("cum_n_t"), col("cum_n_c"),
        col("cum_conv_t"), col("cum_conv_c"),
        col("qini_milli").cast("long").as("qini_milli"),
        col("rand_milli").cast("long").as("rand_milli"),
        col("excess_milli").cast("long").as("excess_milli"))
      .orderBy(col("score").desc)
  }
}
