package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SPLIT-CONFORMAL PREDICTION (Vovk et al.; Angelopoulos & Bates '21
  * tutorial): distribution-free prediction intervals for ANY point
  * predictor. Hold out a calibration split, take the empirical
  * ⌈(n+1)(1−α)⌉-th smallest nonconformity score s = |y − ŷ|, and the
  * interval ŷ ± q̂ covers a fresh point with probability ≥ 1−α — no
  * model or noise assumptions, only exchangeability. The operator of
  * record for "how wrong can this model be" audits over a scored corpus.
  *
  * Engine-exact by construction: scores are integers, the split is the
  * md5 content bucket ([[Sampling.withSplitId]] — membership is a pure
  * function of the key), the rank k = ⌈(n_cal+1)·(den−num)/den⌉ is
  * integer ceiling arithmetic, and q̂ is an ORDER STATISTIC — the k-th
  * smallest VALUE, well-defined under ties regardless of tie order.
  *
  * Scale shape (the q129 counting-sort discipline): q̂ is NOT found by
  * sorting n_cal rows or TakeOrdered(k≈0.9·n) — it's the smallest score
  * whose cumulative calibration count reaches k, computed on the
  * DISTINCT-SCORE frame (one map-side-combined aggregate, then a window
  * over the domain-sized frame: |residual values| distinct entries, not
  * rows). The coverage audit is one more aggregate over the test split
  * with q̂ broadcast as a 1-row scalar. No data-sized windows, no
  * driver-side data.
  */
object Conformal {

  /** Calibrate q̂ on the calibration split and audit per-group coverage
    * on the test split.
    *
    * @param scored   rows carrying a unit key, an integer label and an
    *                 integer prediction
    * @param keyCol   split key (content-hashed; non-null)
    * @param yCol     true label (integral)
    * @param yhatCol  model prediction (integral)
    * @param groupCols coverage-report grouping (e.g. source/domain — the
    *                 slices where a marginal guarantee can hide local
    *                 under-coverage)
    * @param alphaNum / alphaDen miscoverage α as an exact rational
    *                 (1/10 = 90% target coverage)
    * @param calFraction calibration share of the split (rest is test)
    * @param salt     split salt
    * @return one row per group: n_test, n_covered, coverage_pm, plus the
    *         global q_hat, n_cal and rank k (the audit's full provenance)
    */
  def coverageReport(
      scored: DataFrame,
      keyCol: String,
      yCol: String,
      yhatCol: String,
      groupCols: Seq[String],
      alphaNum: Int = 1,
      alphaDen: Int = 10,
      calFraction: Double = 0.5,
      salt: String = ""
  ): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, s"bad alpha $alphaNum/$alphaDen")
    val s = abs(col(yCol).cast("long") - col(yhatCol).cast("long"))
    val tagged = Sampling.withSplitId(
        scored.withColumn("_score", s), keyCol,
        fractions = Seq(calFraction, 1.0 - calFraction), salt = salt,
        splitCol = "_split")
      .localCheckpoint(true) // calibration pass + coverage pass, one scan

    // q̂ from the distinct-score frame: k = ⌈(n_cal+1)·(1−α)⌉ via integer
    // ceiling ((n+1)·(den−num) + den − 1) DIV den, then the smallest
    // score whose running count reaches k
    val calCounts = tagged.filter(col("_split") === 0)
      .groupBy(col("_score")).agg(count(lit(1)).as("_c"))
    // window over the domain-sized distinct-score frame (q129 defense)
    val cum = calCounts.withColumn("_cum",
      sum(col("_c")).over(Window.orderBy(col("_score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // when k > n_cal (calibration too small for the requested α) no score
    // reaches rank k and the certifiable bound is q̂ = ∞ — surfaced as
    // Long.MaxValue so the report reads "everything covered, bound
    // vacuous" rather than silently shrinking the interval
    val qhat = cum
      .crossJoin(calCounts.agg(sum(col("_c")).as("_ncal")))
      .withColumn("_k",
        expr(s"((_ncal + 1) * ${alphaDen - alphaNum} + ${alphaDen - 1}) DIV $alphaDen"))
      .agg(
        coalesce(min(when(col("_cum") >= col("_k"), col("_score"))),
          lit(Long.MaxValue)).as("q_hat"),
        max(col("_ncal")).as("n_cal"), max(col("_k")).as("k_rank"))

    tagged.filter(col("_split") === 1)
      .crossJoin(qhat) // 1-row scalar frame: broadcast, never data-sized
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("_score") <= col("q_hat"), 1L).otherwise(0L)).as("n_covered"),
        max(col("q_hat")).as("q_hat"),
        max(col("n_cal")).as("n_cal"), max(col("k_rank")).as("k_rank"))
      .withColumn("coverage_pm", expr("n_covered * 10000 DIV n_test"))
      .orderBy(groupCols.map(col): _*)
  }
}
