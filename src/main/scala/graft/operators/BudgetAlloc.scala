package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WATER-FILLING TOKEN-BUDGET ALLOCATOR: split a training-token budget B
  * across sources with target weights w_s AND hard availability caps
  * cap_s. Proportional allocation w_s·B/Σw over-asks small sources; the
  * optimal feasible mix (max-min fair, the classic water-filling
  * solution) saturates every source whose cap sits below the waterline
  * and redistributes its surplus over the rest: alloc_s = min(cap_s,
  * w_s·λ) with λ chosen so Σ alloc = B. The allocator a mixture sampler
  * ([[Sampling.mixtureSelect]]) should be DRIVEN BY when caps can bind —
  * quota first, then sampling.
  *
  * The waterline is found without iteration: sorted by cap/weight, the
  * saturated set is a prefix, and a stratum saturates iff
  *     cap_s · Wrem_s ≤ (B − Cbefore_s) · w_s
  * (all integer cross-products; Cbefore = caps of earlier strata, Wrem =
  * weights of this and later strata). Unsaturated strata then split the
  * leftover budget proportionally by weight with truncating division, so
  * Σ alloc ≤ B always (never an over-commit; the ≤ slack is < one unit
  * per stratum).
  *
  * Determinism note: the saturation ORDER uses the integer pair
  * (cap DIV w, (cap mod w)·10⁶ DIV w), tie-broken by stratum name,
  * rather than the exact rational — identical in both engines, overflow-
  * free for any long cap (the scaled term is bounded by the remainder,
  * not the cap), and exact whenever w ≤ 10⁶; two ratios whose fractional
  * parts agree to 10⁻⁶ may order arbitrarily-but-deterministically,
  * shifting one allocation by at most the tie gap. The quantized order
  * is the documented contract.
  *
  * Scale shape: one aggregate builds the strata frame (map-side
  * combined); every window and join after that runs on the STRATA frame
  * (#sources rows), never on the corpus. */
object BudgetAlloc {

  /** @param strata  one row per stratum: `stratumCol`, long `capCol`
    *                (available units) and long `weightCol` (target
    *                weight, > 0)
    * @param budget  a 1-row 1-column DataFrame holding long budget B
    *                (passed as a frame so callers can derive it from
    *                data without a driver round-trip)
    * @return per stratum: cap, weight, saturated, alloc, fill_pm
    *         (alloc/cap), share_pm (alloc/B) */
  def waterFill(
      strata: DataFrame,
      stratumCol: String,
      capCol: String,
      weightCol: String,
      budget: DataFrame
  ): DataFrame = {
    // the budget frame must be exactly one scalar — a multi-row frame
    // would silently duplicate every stratum through the cross join
    require(budget.columns.length == 1 && budget.limit(2).count() == 1,
      "budget must be a 1-row, 1-column frame")
    val b = budget.toDF("_budget")
    val w = Window.orderBy(col("_ord1"), col("_ord2"), col(stratumCol))
    val big = (c: Column) => c.cast("decimal(38,0)")
    val flagged = strata
      // data-dependent validity enforced in-plan (the strata frame is
      // sources-sized): a non-positive weight has no defined share and
      // must fail loudly, not order arbitrarily
      .withColumn("_ord1",
        when(col(weightCol) <= 0,
          raise_error(concat(lit("waterFill: weight must be > 0 for stratum "),
            col(stratumCol).cast("string"))))
          .otherwise(expr(s"$capCol DIV $weightCol")))
      .withColumn("_ord2", expr(s"($capCol % $weightCol) * 1000000 DIV $weightCol"))
      .crossJoin(b) // 1-row scalar
      .withColumn("_cbefore",
        coalesce(sum(col(capCol)).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_wrem",
        sum(col(weightCol)).over(
          w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      // cross-products in DECIMAL(38,0): petascale caps × weight sums
      // exceed the long envelope
      .withColumn("saturated",
        big(col(capCol)) * big(col("_wrem")) <=
          (big(col("_budget")) - big(col("_cbefore"))) * big(col(weightCol)))
    // leftover budget and unsaturated weight mass: a strata-sized
    // aggregate, re-joined as a 1-row scalar frame
    val leftovers = flagged.agg(
      sum(when(col("saturated"), col(capCol)).otherwise(0L)).as("_csat"),
      sum(when(col("saturated"), 0L).otherwise(col(weightCol))).as("_wun"))
    flagged.crossJoin(leftovers)
      .withColumn("alloc",
        when(col("saturated"), col(capCol))
          .otherwise(least(col(capCol),
            expr(s"CAST($weightCol AS DECIMAL(38,0))"
              + " * (_budget - _csat) DIV _wun"))))
      .select(col(stratumCol), col(capCol), col(weightCol),
        col("saturated"), col("alloc"),
        // a zero-cap stratum is vacuously saturated at alloc 0; its
        // fill ratio is undefined — report 0 instead of dividing by 0
        when(col(capCol) > 0,
          expr(s"CAST(alloc AS DECIMAL(38,0)) * 10000 DIV $capCol"))
          .otherwise(0L).as("fill_pm"),
        when(col("_budget") > 0,
          expr("CAST(alloc AS DECIMAL(38,0)) * 10000 DIV _budget"))
          .otherwise(0L).as("share_pm"))
      .orderBy(col(stratumCol))
  }
}
