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
}
