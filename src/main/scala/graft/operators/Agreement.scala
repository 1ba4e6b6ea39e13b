package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CATEGORICAL AGREEMENT INSTRUMENTS — how much two labelers of the
  * same items agree BEYOND CHANCE. RankAgree covers ordered rankings
  * (RBO) and ordinal association (τ-b); this is the nominal-label
  * counterpart: Cohen's κ between two raters — a declared label vs a
  * heuristic's prediction, two model judges, an annotator pair. Raw
  * percent-agree flatters any skewed label distribution (two raters
  * who both say "en" 90% of the time agree 82% by luck alone); κ
  * subtracts exactly that chance floor.
  *
  * Relationship to [[Inference.cohenKappa]] (q187): that is the GLOBAL
  * single-table κ with the full contingency-cell readout (one
  * experiment, inspect the confusion structure). This is the KEYED
  * monitor variant — one row per key with per-key margins — for
  * sweeping κ across a partition of the corpus (per source, per day,
  * per experiment arm), where broadcasting a global scalar onto cells
  * would answer the wrong question. Same integer identity, same
  * truncating-permyriad convention.
  *
  *   κ = (p_o − p_e) / (1 − p_e)
  *     p_o = Σ_k n_kk / N          (observed agreement)
  *     p_e = Σ_k r_k·c_k / N²      (chance agreement from the margins)
  *
  * Integer-exact under the house convention: cross-multiplying out the
  * rationals gives κ = (N·Σn_kk − Σr_k c_k) / (N² − Σr_k c_k), emitted
  * as the signed truncating permyriad sign(num)·10⁴·|num| DIV den in
  * DECIMAL(38,0) internally (N² reaches 10²⁴ at 10¹² rows per key),
  * BIGINT readout (the round-10 decimal-readout convention), NULL when
  * the margins make agreement certain (p_e = 1 ⇒ den = 0: both raters
  * constant). κ is negative when agreement runs BELOW chance.
  *
  * Scale shape: ONE shuffle to the (key, label_a, label_b) contingency
  * cells; everything after — diagonal, margins, the margin dot-product
  * — is bounded by the LABEL DOMAIN per key (languages, verdict
  * classes), never the row count. The margin join is cell-frame-sized.
  *
  * Output per key: n, n_agree, po_pm, pe_pm, kappa_pm.
  */
object Agreement {

  def cohenKappa(df: DataFrame, keyCol: String, aCol: String,
                 bCol: String): DataFrame =
    kappaFromCells(
      df.groupBy(col(keyCol), col(aCol), col(bCol))
        .agg(count(lit(1)).as("__kap_c")),
      keyCol, aCol, bCol, "__kap_c")

  /** The κ finish off a MAINTAINED (key, label_a, label_b, count)
    * census — the streaming-monitor split (the tauBFromCells / PSI /
    * KS twin discipline): confusion-cell counts are algebraic, so a
    * live census under complete-mode aggregation IS the state and this
    * pure view finishes it identically to the batch path. Cells must
    * be unique per (key, a, b). */
  def kappaFromCells(cellDf: DataFrame, keyCol: String, aCol: String,
                     bCol: String, cntCol: String): DataFrame = {
    val cells = cellDf
      .select(col(keyCol).as("key"), col(aCol).as("la"),
        col(bCol).as("lb"), col(cntCol).cast("long").as("c"))
      .localCheckpoint(true) // totals + both margins off one census
    val tot = cells.groupBy("key").agg(
      sum(col("c")).as("n"),
      sum(when(col("la") === col("lb"), col("c")).otherwise(lit(0L)))
        .as("n_agree"))
    val ra = cells.groupBy(col("key"), col("la").as("l"))
      .agg(sum(col("c")).as("r"))
    val cb = cells.groupBy(col("key"), col("lb").as("l"))
      .agg(sum(col("c")).as("cc"))
    // Σ r_k·c_k: inner join on the label — a label missing from either
    // margin contributes 0 to the dot product
    val rc = ra.join(cb, Seq("key", "l"))
      .groupBy("key")
      .agg(coalesce(sum(expr("CAST(r AS DECIMAL(38,0)) * cc")),
        lit(0).cast("decimal(38,0)")).as("src"))
    tot.join(rc, Seq("key"), "left")
      .withColumn("src", coalesce(col("src"), lit(0).cast("decimal(38,0)")))
      .withColumn("_num", expr(
        "CAST(n AS DECIMAL(38,0)) * n_agree - src"))
      .withColumn("_den", expr(
        "CAST(n AS DECIMAL(38,0)) * n - src"))
      .select(col("key").as(keyCol), col("n").cast("long").as("n"),
        col("n_agree").cast("long").as("n_agree"),
        expr("CAST(10000 * n_agree DIV n AS BIGINT)").as("po_pm"),
        expr("CAST(10000 * src DIV (CAST(n AS DECIMAL(38,0)) * n)" +
          " AS BIGINT)").as("pe_pm"),
        expr("""CAST(
          CASE WHEN _num >= 0 THEN 1 ELSE -1 END
          * (10000 * abs(_num) DIV nullif(_den, 0)) AS BIGINT)""")
          .as("kappa_pm"))
  }
}
