package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) calibration by the PAVA min-max
  * identity, in fixed-point micros, over a BOUNDED bin frame.
  *
  * The pool-adjacent-violators fit has a closed form that needs no
  * iteration: for bins 1..B with positive counts `pos` and totals `n`,
  *
  *   iso(i) = max_{j<=i} min_{k>=i} rate(j..k)
  *
  * where rate(j..k) is the pooled positive rate over the contiguous
  * block j..k. We evaluate rate in truncating fixed point
  * ((1e6 * pos) DIV n) so min/max compare integers — both engines
  * replay the identical arithmetic, and the fit is still monotone
  * because the min-max identity holds for ANY fixed per-block values.
  *
  * SCALE SHAPE: the input is a bin frame (score-domain-sized, B <= a
  * few hundred), produced by one aggregation over the raw rows. The
  * O(B^2) pair frame and O(B^3)-ish triple join are driver-trivial
  * (B=40 -> 45k rows) and independent of corpus size; the only
  * data-sized stage is the upstream groupBy. This is exactly how a
  * calibration curve should be fit at 100 TB: reduce first, fit on the
  * reduced frame.
  */
object Isotonic {

  /** Fit over `bins(binCol, nCol, posCol)`; returns one row per bin:
    * (bin, n, pos, raw_rate_micro, iso_rate_micro), iso monotone
    * non-decreasing in bin order. Every bin must have n > 0 (bins come
    * from a groupBy, so they do). */
  def isotonicBins(bins: DataFrame, binCol: String, nCol: String,
                   posCol: String): DataFrame = {
    // bounded frame: the global window is domain-sized by construction
    val w = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = bins
      .select(col(binCol).cast("long").as("b"),
        col(nCol).cast("long").as("n"), col(posCol).cast("long").as("pos"))
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("cpos", sum(col("pos")).over(w))
    val lo = c.select(col("b").as("j"),
      (col("cn") - col("n")).as("cn_j0"), (col("cpos") - col("pos")).as("cpos_j0"))
    val hi = c.select(col("b").as("k"),
      col("cn").as("cn_k"), col("cpos").as("cpos_k"))
    // every contiguous block j..k with its pooled truncating rate
    val blocks = lo.join(hi, col("j") <= col("k"))
      .select(col("j"), col("k"),
        expr("(1000000 * (cpos_k - cpos_j0)) DIV (cn_k - cn_j0)").as("rate"))
    val ids = c.select(col("b").as("i"), col("n"), col("pos"),
      expr("(1000000 * pos) DIV n").as("raw_rate_micro"))
    ids
      .join(blocks, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("n"), col("pos"), col("raw_rate_micro"), col("j"))
      .agg(min(col("rate")).as("mr"))
      .groupBy(col("i").as("bin"), col("n"), col("pos"), col("raw_rate_micro"))
      .agg(max(col("mr")).as("iso_rate_micro"))
      .orderBy("bin")
  }
}
