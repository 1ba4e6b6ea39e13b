package graft.operators

import org.apache.spark.sql.DataFrame
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
}
