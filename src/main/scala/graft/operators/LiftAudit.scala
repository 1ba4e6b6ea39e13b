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
}
