package graft.operators

import org.apache.spark.sql.DataFrame
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
