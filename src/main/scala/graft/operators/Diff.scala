package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TABLE DIFF — reconcile two versions of a keyed table into
  * `(key…, change, changed_cols)` where change ∈ added | removed |
  * changed; unchanged rows are omitted. The regression-diff primitive
  * for pipeline migrations: "same input, new code — what moved?"
  *
  * Value comparison is NULL-SAFE per column (`<=>`): a null→value or
  * value→null transition reports as changed, null→null does not.
  * `changed_cols` is the comma-joined list of differing non-key columns
  * in a fixed order (the sorted common column names), so the report
  * itself is engine-exact and diffable.
  *
  * Scale shape: ONE full-outer shuffle join on the key; the per-column
  * comparison is a codegen projection over the joined row; output is
  * changed-rows-sized. Keys must be non-null on both sides (usual join
  * semantics — null keys would silently never match, misreporting a
  * row as an add+remove pair; [[Contracts.notNull]] is the gate). */
object Diff {

  /** AGGREGATE RECONCILIATION — a master amount column against an
    * aggregate of a detail table (order total vs Σ line revenue, ledger
    * balance vs Σ postings): `(key…, master_amount, detail_amount,
    * diff, status)` for every key that does NOT reconcile within
    * `tolerance`, with status ∈ mismatch | missing_detail |
    * missing_master. Reconciled keys are omitted, so output is
    * discrepancy-sized.
    *
    * Money discipline: both amount expressions must be INTEGER UNITS of
    * the caller's chosen grain — cents, micro-dollars — quantized with
    * `round()` at the source (the q70 quantize-then-sum pattern). The
    * engine-parity lesson behind this: a DECIMAL(12,2) three-factor
    * revenue product overflows DuckDB's width-38 multiply and silently
    * falls back to DOUBLE, producing one-cent rounding drift against
    * Spark's decimal sum — integer units make every sum, compare and
    * report value order-free and engine-exact by construction. Missing
    * sides count their full amount as the discrepancy.
    *
    * Scale shape: one map-side-combined aggregate over the detail table
    * (keys × amount only), ONE full-outer key join against the master
    * projection, codegen compare. Nothing wider than (key, amount)
    * shuffles. */
  def reconcile(
      master: DataFrame,
      detail: DataFrame,
      keyCols: Seq[String],
      masterAmount: Column,
      detailAmount: Column,
      tolerance: Long = 0L
  ): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(tolerance >= 0L, "tolerance must be >= 0")
    val m = master.select(keyCols.map(c => col(c).as(s"_m_$c")) :+
      masterAmount.cast("long").as("_m_amt"): _*)
    val d = detail.groupBy(keyCols.map(col): _*)
      .agg(detailAmount.cast("long").as("_d_amt"))
      .select(keyCols.map(c => col(c).as(s"_d_$c")) :+ col("_d_amt"): _*)
    val cond = keyCols.map(c => col(s"_m_$c") === col(s"_d_$c")).reduce(_ && _)
    val diff = coalesce(col("_m_amt"), lit(0L)) - coalesce(col("_d_amt"), lit(0L))
    val keyOut = keyCols.map(c => coalesce(col(s"_m_$c"), col(s"_d_$c")).as(c))
    m.join(d, cond, "full_outer")
      .select(keyOut ++ Seq(
        col("_m_amt").as("master_amount"),
        col("_d_amt").as("detail_amount"),
        diff.as("diff"),
        when(col("_d_amt").isNull, lit("missing_detail"))
          .when(col("_m_amt").isNull, lit("missing_master"))
          .otherwise(lit("mismatch")).as("status")): _*)
      .filter(col("status") =!= "mismatch" || abs(col("diff")) > tolerance)
      .orderBy(keyCols.map(col): _*)
  }

  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val commonCols = oldDf.columns.toSeq.intersect(newDf.columns.toSeq)
    require(keyCols.forall(commonCols.contains),
      s"key columns ${keyCols.diff(commonCols).mkString(", ")} missing from a side")
    val valueCols = commonCols.filterNot(keyCols.contains).sorted

    val o = oldDf.select(commonCols.map(c => col(c).as(s"_o_$c")): _*)
      .withColumn("_in_old", lit(true))
    val n = newDf.select(commonCols.map(c => col(c).as(s"_n_$c")): _*)
      .withColumn("_in_new", lit(true))
    val cond = keyCols.map(c => col(s"_o_$c") === col(s"_n_$c")).reduce(_ && _)
    val joined = o.join(n, cond, "full_outer")

    val changedCols =
      if (valueCols.isEmpty) lit("")
      else array_join(array_compact(array(valueCols.map(c =>
        when(!(col(s"_o_$c") <=> col(s"_n_$c")), lit(c))): _*)), ",")
    val keyOut = keyCols.map(c => coalesce(col(s"_n_$c"), col(s"_o_$c")).as(c))
    joined
      .select(keyOut ++ Seq(
        when(col("_in_old").isNull, lit("added"))
          .when(col("_in_new").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change"),
        when(col("_in_old").isNull || col("_in_new").isNull, lit(""))
          .otherwise(changedCols).as("changed_cols")): _*)
      .filter(col("change") =!= "changed" || col("changed_cols") =!= "")
      .orderBy(keyCols.map(col) :+ col("change"): _*)
  }
}
