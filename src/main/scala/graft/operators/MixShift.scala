package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MIX-SHIFT DECOMPOSITION — the "why did the average move" report:
  * between two periods, a composite average changes partly because
  * per-segment RATES moved and partly because the segment MIX moved; a
  * dashboard that can't split the two routinely blames the wrong team
  * (Simpson's-paradox territory: every segment can improve while the
  * total falls). The two-part attribution used here is the standard
  * telescoping form
  *
  *     M_p = Σ_k share_k,p · rate_k,p          (share = n_k/N, rate = v_k/n_k)
  *     ΔM  = Σ_k share_k,A · Δrate_k     [rate effect — what teams did]
  *         + Σ_k Δshare_k  · rate_k,B    [mix effect — who showed up]
  *
  * which is EXACT over the rationals (cross terms cancel pairwise).
  * Each per-segment effect is reported in truncating micro units via
  * one DECIMAL(38,0) cross-multiplied division:
  *
  *     rate_eff  = 10⁶·(v_B·n_A − v_A·n_B) DIV (N_A·n_B)
  *     mix_eff   = 10⁶·(n_B·N_A − n_A·N_B)·v_B DIV (N_A·N_B·n_B)
  *
  * so the readout is deterministic and bit-replayable; because each
  * term truncates independently, the truncated effects need not sum to
  * the exact Δ — the exact integer endpoints travel alongside
  * (delta detection belongs to the exact columns, attribution to the
  * micro ones).
  *
  * Scale shape: ONE map-side-combined aggregate collapses the input to
  * segment cells, the period totals are a 1-row crossJoin scalar (the
  * q84 pattern), and everything after runs on the segment-count frame.
  *
  * @param df        row-grain frame
  * @param keyCol    segment
  * @param inBCol    boolean: row belongs to period B (else A)
  * @param valueCol  integral value per row (counts the metric mass)
  * @return per segment: (key, n_a, n_b, v_a, v_b, rate_a_micro,
  *         rate_b_micro, rate_effect_micro, mix_effect_micro), ordered
  *         by key; segments missing from a period carry zeros and NULL
  *         effects (no rate to attribute)
  */
object MixShift {

  def decompose(df: DataFrame, keyCol: String, inBCol: String,
                valueCol: String): DataFrame = {
    val cells = df
      .groupBy(col(keyCol))
      .agg(
        sum(when(!col(inBCol), 1L).otherwise(0L)).as("n_a"),
        sum(when(col(inBCol), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col(inBCol), col(valueCol).cast("long")).otherwise(0L))
          .as("v_a"),
        sum(when(col(inBCol), col(valueCol).cast("long")).otherwise(0L))
          .as("v_b"))
      .localCheckpoint(true) // totals + report share one aggregate
    val totals = cells.agg(sum(col("n_a")).as("na_tot"),
      sum(col("n_b")).as("nb_tot"))
    cells.crossJoin(totals) // 1-row scalar
      .withColumn("rate_a_micro",
        expr("CASE WHEN n_a > 0 THEN (1000000 * CAST(v_a AS DECIMAL(38,0))) DIV n_a END"))
      .withColumn("rate_b_micro",
        expr("CASE WHEN n_b > 0 THEN (1000000 * CAST(v_b AS DECIMAL(38,0))) DIV n_b END"))
      .withColumn("rate_effect_micro", expr(
        """CASE WHEN n_a > 0 AND n_b > 0 THEN
          |  (1000000 * (CAST(v_b AS DECIMAL(38,0)) * n_a
          |              - CAST(v_a AS DECIMAL(38,0)) * n_b))
          |  DIV (CAST(na_tot AS DECIMAL(38,0)) * n_b) END"""
          .stripMargin.replace("\n", " ")))
      .withColumn("mix_effect_micro", expr(
        """CASE WHEN n_b > 0 THEN
          |  (1000000 * (CAST(n_b AS DECIMAL(38,0)) * na_tot
          |              - CAST(n_a AS DECIMAL(38,0)) * nb_tot)
          |           * v_b)
          |  DIV (CAST(na_tot AS DECIMAL(38,0)) * nb_tot * n_b) END"""
          .stripMargin.replace("\n", " ")))
      .select(col(keyCol), col("n_a"), col("n_b"), col("v_a"), col("v_b"),
        col("rate_a_micro").cast("long").as("rate_a_micro"),
        col("rate_b_micro").cast("long").as("rate_b_micro"),
        col("rate_effect_micro").cast("long").as("rate_effect_micro"),
        col("mix_effect_micro").cast("long").as("mix_effect_micro"))
      .orderBy(keyCol)
  }
}
