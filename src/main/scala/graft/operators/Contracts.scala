package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DATA-CONTRACT CHECKER — declarative constraints over a table, evaluated
  * as a violations report `(contract, violations, total, pass)`.
  *
  * Scale shape: every row-level check (not-null, range, set, regex, any
  * boolean predicate) compiles into ONE map-side-combined aggregate pass
  * over the table — adding a check adds a codegen'd `sum(case when …)`
  * column, never a scan. Uniqueness needs the group-count shuffle its
  * semantics demand (one per distinct key-set, on the key columns only);
  * referential integrity is a left-anti join against the DISTINCT parent
  * keys (broadcast under AQE when the parent is dimension-sized). The
  * report rows themselves are 1-row frames — the cross-joins stitching
  * them are 1×1, not data-sized.
  *
  * Null discipline (each contract checks exactly its own aspect):
  * `notNull` counts nulls; `inRange`/`inSet`/`matches` count only NON-NULL
  * offenders, so a null column never double-fails; `unique` counts excess
  * rows beyond the first per duplicated key (null keys group like values);
  * `foreignKey` counts non-null child keys with no parent.
  *
  * Streaming: a report of ONLY row-level [[Check]]s is a single
  * aggregation and runs unchanged as a complete-mode Structured
  * Streaming query — live contract monitoring over a stream
  * (StreamingSpec's twin test). `Unique`/`ForeignKey` need their own
  * aggregation/join passes and stay batch-side.
  */
object Contracts {

  sealed trait Contract { def label: String }

  /** Row-level predicate contract: a row VIOLATES when `violated` is true;
    * nulls in `violated` count as non-violations (use [[notNull]] for
    * null policing). */
  final case class Check(label: String, violated: Column) extends Contract

  /** No two rows share a value of `columns`; violations = excess rows. */
  final case class Unique(label: String, columns: Seq[String]) extends Contract

  /** Every non-null `column` value exists in `parent.parentColumn`. */
  final case class ForeignKey(label: String, column: String,
      parent: DataFrame, parentColumn: String) extends Contract

  def notNull(column: String): Check =
    Check(s"not_null($column)", col(column).isNull)

  /** Closed interval on any orderable column; bounds given as SQL literal
    * strings so callers keep decimal/timestamp exactness. */
  def inRange(column: String, lo: String, hi: String): Check =
    Check(s"in_range($column)",
      col(column).isNotNull && !(col(column) >= expr(lo) && col(column) <= expr(hi)))

  def inSet(column: String, values: Seq[String]): Check =
    Check(s"in_set($column)",
      col(column).isNotNull && !col(column).isin(values: _*))

  /** RE2-portable patterns only (both engines must agree at oracle time). */
  def matches(column: String, pattern: String): Check =
    Check(s"matches($column)",
      col(column).isNotNull && !col(column).rlike(pattern))

  /** The violations report, one row per contract, ordered by label.
    * Requires at least one contract and distinct labels (the report key). */
  def report(df: DataFrame, contracts: Seq[Contract]): DataFrame = {
    require(contracts.nonEmpty, "at least one contract")
    val labels = contracts.map(_.label)
    require(labels.distinct.size == labels.size,
      s"duplicate contract labels: ${labels.diff(labels.distinct).mkString(", ")}")

    val checks = contracts.collect { case c: Check => c }
    val rowFrames: Seq[DataFrame] =
      if (checks.isEmpty) Nil
      else {
        val aggs = count(lit(1)).cast("long").as("_total") +:
          checks.zipWithIndex.map { case (c, i) =>
            coalesce(sum(when(c.violated, 1L).otherwise(0L)), lit(0L)).as(s"_v$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val kvs = checks.zipWithIndex.map { case (c, i) =>
          struct(lit(c.label).as("contract"), col(s"_v$i").as("violations"))
        }
        Seq(one.select(explode(array(kvs: _*)).as("kv"), col("_total"))
          .select(col("kv.contract").as("contract"),
            col("kv.violations").as("violations"),
            col("_total").as("total")))
      }

    val uniqueFrames = contracts.collect { case u: Unique =>
      require(u.columns.nonEmpty, s"${u.label}: empty column list")
      df.groupBy(u.columns.map(col): _*)
        .agg(count(lit(1)).as("_cnt"))
        .agg(coalesce(sum(col("_cnt") - lit(1L)), lit(0L)).as("violations"),
          coalesce(sum(col("_cnt")), lit(0L)).as("total"))
        .select(lit(u.label).as("contract"), col("violations"), col("total"))
    }

    val fkFrames = contracts.collect { case fk: ForeignKey =>
      val orphans = df.select(col(fk.column).as("_k")).filter(col("_k").isNotNull)
        .join(fk.parent.select(col(fk.parentColumn).as("_k")).distinct(),
          Seq("_k"), "left_anti")
        .agg(count(lit(1)).cast("long").as("violations"))
      val total = df.agg(count(lit(1)).cast("long").as("total"))
      orphans.crossJoin(total)
        .select(lit(fk.label).as("contract"), col("violations"), col("total"))
    }

    (rowFrames ++ uniqueFrames ++ fkFrames)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === lit(0L))
      .orderBy("contract")
  }
}
