package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CLASSIFIER EVALUATION against labeled data — the confusion-derived
  * per-class report every model the engine hosts (language ID q23,
  * quality scoring q145, label audit q127) needs before its output is
  * trusted as a training-data filter: per class, true/predicted
  * support, true positives, precision/recall/F1, and the family-wide
  * accuracy on every row (the crossJoin-summary convention).
  *
  * Integer discipline: precision/recall are one truncating DIV each
  * into per-myriad; F1 nests the already-truncated P and R
  * ((2·P·R) DIV (P+R) — the harmonic mean of what was reported, not of
  * unreported exact ratios), so the table is self-consistent and
  * engine-exact.
  *
  * Scale shape: ONE (truth, pred)-grain aggregate (map-side combined;
  * the frame is |classes|²-bounded), then class-sized joins of the two
  * marginals. The label scan is the only data-sized pass.
  */
object ClassEval {

  /** @param df       one row per evaluated unit
    * @param truthCol ground-truth class
    * @param predCol  predicted class
    * @return per class (union of truth and prediction vocabularies):
    *         class, n_true, n_pred, tp, precision_pm, recall_pm,
    *         f1_pm, accuracy_pm — ordered by class; a class absent
    *         from one side carries 0 support there, NULL metrics where
    *         the denominator is empty
    */
  def confusionReport(df: DataFrame, truthCol: String,
      predCol: String): DataFrame = {
    val cells = df
      .groupBy(col(truthCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // classes²-sized; marginals + tp share it
    val truthTot = cells.groupBy(col("t").as("clazz"))
      .agg(sum(col("n")).as("n_true"))
    val predTot = cells.groupBy(col("p").as("clazz"))
      .agg(sum(col("n")).as("n_pred"))
    val tp = cells.filter(col("t") === col("p"))
      .select(col("t").as("clazz"), col("n").as("tp"))
    val summary = cells.agg(
      sum(col("n")).as("n_units"),
      sum(when(col("t") === col("p"), col("n")).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy_pm", expr("(10000 * n_correct) DIV n_units"))
      .select("n_units", "accuracy_pm")
    truthTot
      .join(predTot, Seq("clazz"), "full_outer")
      .join(tp, Seq("clazz"), "left")
      .withColumn("n_true", coalesce(col("n_true"), lit(0L)))
      .withColumn("n_pred", coalesce(col("n_pred"), lit(0L)))
      .withColumn("tp", coalesce(col("tp"), lit(0L)))
      .withColumn("precision_pm",
        when(col("n_pred") > 0, expr("(10000 * tp) DIV n_pred")))
      .withColumn("recall_pm",
        when(col("n_true") > 0, expr("(10000 * tp) DIV n_true")))
      .withColumn("f1_pm", expr(
        """CASE WHEN precision_pm IS NOT NULL AND recall_pm IS NOT NULL
          |  AND precision_pm + recall_pm > 0
          |  THEN (2 * precision_pm * recall_pm) DIV (precision_pm + recall_pm)
          |END""".stripMargin))
      .crossJoin(summary)
      .select("clazz", "n_true", "n_pred", "tp", "precision_pm",
        "recall_pm", "f1_pm", "accuracy_pm")
      .orderBy("clazz")
  }

  /** THRESHOLD SWEEP — the operating-point table for a score-gated
    * binary filter: at every distinct score value (treated as the
    * "keep if score ≥ s" cut), how many units survive and what
    * precision/recall/F1 the gate achieves against the label. The
    * actionable complement of a single AUC number (q199): an operator
    * picks a row, not an integral.
    *
    * Same integer discipline as [[confusionReport]] (truncated pm
    * ratios, F1 over the reported P and R); computed at SCORE-GRAIN
    * like the Qini curve — one aggregate collapses units to distinct
    * scores, cumulative windows run over the score-domain frame
    * (quantize continuous scores first at 100 TB).
    *
    * @return per descending threshold: score, kept, tp, precision_pm,
    *         recall_pm, f1_pm
    */
  def thresholdSweep(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val cells = df
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"))
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("kept", sum(col("n")).over(wCum))
      .withColumn("tp", sum(col("n_pos")).over(wCum))
      .withColumn("total_pos", sum(col("n_pos")).over(wAll))
      .withColumn("precision_pm", expr("(10000 * tp) DIV kept"))
      .withColumn("recall_pm",
        when(col("total_pos") > 0, expr("(10000 * tp) DIV total_pos")))
      .withColumn("f1_pm", expr(
        """CASE WHEN recall_pm IS NOT NULL AND precision_pm + recall_pm > 0
          |  THEN (2 * precision_pm * recall_pm) DIV (precision_pm + recall_pm)
          |END""".stripMargin))
      .select("score", "kept", "tp", "precision_pm", "recall_pm", "f1_pm")
      .orderBy(col("score").desc)
  }

  /** PR-AUC — the area under the precision–recall curve, the metric
    * that matters when positives are rare (ROC-AUC saturates under
    * class imbalance; PR-AUC does not). Computed as the trapezoid
    * integral of precision over recall at SCORE-CELL boundaries (the
    * [[thresholdSweep]] grain): descending thresholds trace the curve,
    * each zero-width (Δtp = 0) segment contributes nothing, and the
    * conventional (recall 0, precision 1) start point anchors the first
    * segment. Per-term truncating micro division over DECIMAL(38,0)
    * cross-products — deterministic, bit-replayable in SQL, overflow-
    * safe to ~10¹⁰ rows.
    *
    * @return ONE row: n, total_pos, n_cells, pr_auc_micro
    */
  def prAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val cells = df
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("np"))
    // windows run over the score-CELL frame (bounded by the score
    // domain — the thresholdSweep/WindowAudit-adjudicated shape)
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wLag = Window.orderBy(col("score").desc)
    cells
      .withColumn("kept", sum(col("n")).over(wCum))
      .withColumn("tp", sum(col("np")).over(wCum))
      .withColumn("pos_total", sum(col("np")).over(wAll))
      .withColumn("kept0", coalesce(lag(col("kept"), 1).over(wLag), lit(0L)))
      .withColumn("tp0", coalesce(lag(col("tp"), 1).over(wLag), lit(0L)))
      .withColumn("term", expr(
        """CASE WHEN pos_total > 0 AND tp > tp0 THEN
          |  CASE WHEN kept0 = 0
          |    THEN (1000000 * CAST(tp - tp0 AS DECIMAL(38,0)) * (tp + kept))
          |         DIV (2 * CAST(pos_total AS DECIMAL(38,0)) * kept)
          |    ELSE (1000000 * CAST(tp - tp0 AS DECIMAL(38,0))
          |           * (tp * kept0 + tp0 * kept))
          |         DIV (2 * CAST(pos_total AS DECIMAL(38,0)) * kept * kept0)
          |  END ELSE CAST(0 AS DECIMAL(38,0)) END"""
          .stripMargin.replace("\n", " ")))
      .agg(max(col("kept")).as("n"),
        max(col("tp")).as("total_pos"),
        count(lit(1)).as("n_cells"),
        sum(col("term")).cast("long").as("pr_auc_micro"))
  }
}
