package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-ANONYMITY AUDIT — how re-identifiable is a table through a set of
  * quasi-identifier columns? A row is at risk when its QI combination is
  * shared by fewer than k rows; the release rule "every equivalence
  * class has ≥ k members" is the classic k-anonymity criterion
  * (Sweeney 2002). Companion to the PII redaction pass (q51): redaction
  * removes direct identifiers, this measures the joinability of what's
  * left.
  *
  * Scale shape: ONE group-count shuffle on the QI columns (map-side
  * combined), then the report aggregates the class-size table —
  * classes, not rows. [[riskyClasses]] returns QI combos only (no row
  * payloads), so nothing data-sized ever leaves the aggregation. */
object Privacy {

  /** One-row report: `(n_rows, n_classes, n_risky_classes, n_risky_rows,
    * min_class_size, k_anonymous)` — `k_anonymous` means NO class is
    * smaller than k (vacuously true on an empty table; min_class_size
    * is 0 there). Null QI values group like values (a null ZIP is
    * itself a quasi-identifier value). */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2L, "k must be >= 2 (k=1 is vacuous)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_sz"))
      .agg(
        coalesce(sum(col("_sz")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("_sz") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_risky_classes"),
        coalesce(sum(when(col("_sz") < k, col("_sz")).otherwise(0L)), lit(0L))
          .as("n_risky_rows"),
        coalesce(min(col("_sz")), lit(0L)).as("min_class_size"))
      .withColumn("k_anonymous", col("n_risky_rows") === lit(0L))
  }

  /** L-DIVERSITY AUDIT — k-anonymity's necessary complement: a class can
    * hold ≥ k members yet expose everyone in it when they all share ONE
    * sensitive value (the homogeneity attack of Machanavajjhala et al.
    * 2007). A class is l-diverse when its members carry ≥ l DISTINCT
    * sensitive values; the report counts the classes (and rows) that
    * fail.
    *
    * Scale shape: distinct(QI, sensitive) then two class-sized
    * aggregates — the same one-logical-shuffle-on-QI budget as
    * [[kAnonymityReport]] (the distinct pre-pass combines map-side on
    * (QI, sensitive), and both counts ride the SAME QI exchange). Null
    * sensitive values count as a value (a null diagnosis is itself
    * disclosive). */
  def lDiversityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2L, "l must be >= 2 (l=1 is vacuous)")
    val qi = quasiCols.map(col)
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("_sz"),
        // count_distinct treats null as absent; count null sensitive
        // values as one extra value when present
        (countDistinct(col(sensitiveCol)) +
          max(when(col(sensitiveCol).isNull, 1L).otherwise(0L))).as("_nv"))
      .agg(
        coalesce(sum(col("_sz")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_classes"),
        coalesce(sum(when(col("_nv") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_homogeneous_classes"),
        coalesce(sum(when(col("_nv") < l, col("_sz")).otherwise(0L)), lit(0L))
          .as("n_exposed_rows"),
        coalesce(min(col("_nv")), lit(0L)).as("min_diversity"))
      .withColumn("l_diverse", col("n_exposed_rows") === lit(0L))
  }

  /** The offending QI combinations and their sizes, smallest (most
    * identifying) first — the worklist for generalization/suppression. */
  def riskyClasses(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2L, "k must be >= 2 (k=1 is vacuous)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
      .orderBy(col("class_size").asc +: quasiCols.map(col(_).asc): _*)
  }

  /** RIGHT-TO-BE-FORGOTTEN propagation: purge every row keyed to a
    * deletion list across a set of tables, returning both the purged
    * frames and the AUDIT LEDGER `(tbl, n_before, n_purged, n_after)` a
    * deletion request needs for its compliance record (n_before =
    * n_purged + n_after by construction — the ledger self-checks).
    *
    * Scale shape: per table, ONE left-anti join against the DISTINCT
    * deletion keys (dimension-sized → broadcast under AQE) for the
    * purged frame, plus a semi-join count for the ledger; the deletion
    * list is read once and checkpointed. Rows never shuffle on anything
    * but the key; the ledger is tables-sized. */
  def forgetKeys(
      tables: Seq[(String, DataFrame, String)],
      deletions: DataFrame,
      deletionKeyCol: String
  ): (Seq[(String, DataFrame)], DataFrame) = {
    require(tables.nonEmpty, "need at least one table")
    require(tables.map(_._1).distinct.size == tables.size, "duplicate table names")
    val keys = deletions.select(col(deletionKeyCol).as("_k"))
      .filter(col("_k").isNotNull).distinct()
      .localCheckpoint(true)
    val purged = tables.map { case (name, df, keyCol) =>
      name -> df.join(keys, df(keyCol) === keys("_k"), "left_anti")
    }
    val ledger = tables.map { case (name, df, keyCol) =>
      val hit = df.join(keys, df(keyCol) === keys("_k"), "left_semi")
        .agg(count(lit(1)).as("n_purged"))
      val total = df.agg(count(lit(1)).as("n_before"))
      total.crossJoin(hit)
        .select(lit(name).as("tbl"), col("n_before"), col("n_purged"),
          (col("n_before") - col("n_purged")).as("n_after"))
    }.reduce(_ unionByName _).orderBy("tbl")
    (purged, ledger)
  }

  /** T-CLOSENESS AUDIT (Li, Li & Venkatasubramanian '07) — the third
    * rung of the privacy ladder this module climbs (k-anonymity: class
    * sizes; l-diversity: distinct sensitive values; t-closeness: the
    * DISTRIBUTION of sensitive values per class must stay close to the
    * global one — an attacker learns little beyond the prior). For an
    * ORDINAL sensitive attribute the distance is the 1-D Earth Mover's
    * Distance, EMD = (1/(m−1))·Σ_k |CumP_k − CumQ_k| over the m ordered
    * categories — which cross-multiplies to exact integers:
    *     emd_pm = 10⁴·Σ_k |N·cp_k − n_c·cq_k| DIV ((m−1)·n_c·N)
    * (cp/cq cumulative class/global counts). The sensitive attribute
    * must be NUMERIC ordinal (bands, scores, ages); NULL values form
    * their own category ordered FIRST — implemented as a Long.MinValue
    * sentinel so every grid join stays a plain equi-join (the module's
    * null-is-a-value discipline).
    *
    * Scale shape: one (QI, category) count shuffle; the cumulative
    * distributions live on the classes × m GRID (built from the class
    * and category frames so a class missing a category still carries
    * its cumulative row — dropping it would understate the distance);
    * windows run per class over m rows. */
  def tClosenessReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      tPm: Long
  ): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(tPm > 0 && tPm < 10000, s"tPm in (0, 10000), got $tPm")
    val big = (c: Column) => c.cast("decimal(38,0)")
    val qi = quasiCols.map(col)
    val cat = coalesce(col(sensitiveCol).cast("long"), lit(Long.MinValue))
    val cells = df.groupBy(qi :+ cat.as("_cat"): _*)
      .agg(count(lit(1)).as("_cc"))
      .localCheckpoint(true) // classes, categories and the grid all read it
    val classes = cells.groupBy(qi: _*).agg(sum(col("_cc")).as("n_c"))
    val cats = cells.groupBy(col("_cat")).agg(sum(col("_cc")).as("_gc"))
    val m = Window.partitionBy(qi: _*)
      .orderBy(col("_cat").asc) // MinValue sentinel = nulls first
      .rowsBetween(Window.unboundedPreceding, 0)
    val grid = classes.crossJoin(cats) // classes × m audit grid
      .join(cells, quasiCols :+ "_cat", "left")
      .withColumn("_cc", coalesce(col("_cc"), lit(0L)))
      .withColumn("_cp", sum(col("_cc")).over(m))
      .withColumn("_cq", sum(col("_gc")).over(m))
      .crossJoin(cells.agg(sum(col("_cc")).as("_nn"),
        countDistinct(col("_cat")).as("_m"))) // sentinel counts as a value
    grid
      // the last category's cumulative term is always 0 — summing all m
      // keeps the formula readable; the (m−1) divisor is what matters
      .groupBy(qi :+ col("n_c"): _*)
      .agg(sum(abs(big(col("_nn")) * col("_cp") - big(col("n_c")) * col("_cq")))
        .cast("decimal(38,0)").as("_d"),
        max(col("_nn")).as("_nn"), max(col("_m")).as("_m"))
      .withColumn("emd_pm",
        when(col("_m") > 1,
          expr("10000 * _d DIV ((_m - 1) * CAST(n_c AS DECIMAL(38,0)) * _nn)"))
          .otherwise(0L))
      .withColumn("within_t", col("emd_pm") <= tPm)
      .select(qi ++ Seq(col("n_c"), col("emd_pm"), col("within_t")): _*)
      .orderBy(qi: _*)
  }
}
