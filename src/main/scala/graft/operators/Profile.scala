package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DATA PROFILING — the read-side companion to [[Contracts]]: equi-width
  * histograms and per-group column summaries, both as single
  * map-side-combined aggregation passes.
  *
  * Engine-exactness posture: bin assignment is `floor((v − lo) / width)`
  * where the caller picks `lo`/`hi`/`bins` so `width` is exactly
  * representable (e.g. 10.0) — IEEE division and floor are then
  * correctly rounded identically on every engine. Summaries report
  * counts (long) and raw min/max (untouched doubles), never derived
  * float moments, so results hash-compare across engines.
  */
object Profile {

  /** `(groupCols…, bin, bin_lo, bin_hi, n)` — values binned into `bins`
    * equal widths over [lo, hi); out-of-range values CLAMP into the edge
    * bins (so totals reconcile with row counts and a stray outlier is
    * visible at the edge rather than silently dropped); NULLs are
    * excluded (their count belongs to [[summary]]). Empty bins are
    * absent — the output is group×occupied-bins sized. One aggregation
    * pass; the bin projection is codegen arithmetic. Being a single
    * aggregation, it runs unchanged as a complete-mode streaming query
    * (StreamingSpec twin) — a live distribution monitor. */
  def equiWidthHistogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      bins: Int
  ): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val raw = floor((col(valueCol) - lit(lo)) / lit(width)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    val keys = groupCols.map(col) :+ bin.as("bin")
    df.filter(col(valueCol).isNotNull)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"))
      .select(groupCols.map(col) ++ Seq(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("bin") + lit(1L)) * lit(width)).as("bin_hi"),
        col("n")): _*)
      .orderBy(groupCols.map(col) :+ col("bin"): _*)
  }

  /** FUNCTIONAL-DEPENDENCY AUDIT — for each candidate `determinant →
    * dependent`, does every determinant group map to exactly one
    * dependent value? `(determinant, dependent, n_groups,
    * n_violating_groups, holds)` — the profiling complement to
    * [[Contracts.Unique]] (a key is the FD `key → everything`). NULLs
    * group as values on both sides (a det-group of nulls is a group; a
    * null dependent is a value), matching the contract checker's null
    * discipline.
    *
    * Scale shape: one (determinant ∪ dependent) group-count shuffle per
    * candidate, then a determinant-keyed aggregate over the group table
    * — groups, not rows; the report is candidates-sized. */
  def functionalDependencies(
      df: DataFrame,
      deps: Seq[(Seq[String], String)]
  ): DataFrame = {
    require(deps.nonEmpty, "need at least one candidate dependency")
    deps.map { case (det, dep) =>
      require(det.nonEmpty, "empty determinant")
      require(!det.contains(dep), s"dependent $dep inside its own determinant")
      val groups = df
        .groupBy((det :+ dep).map(col): _*).agg(count(lit(1)).as("_n"))
        .groupBy(det.map(col): _*).agg(count(lit(1)).as("_vals"))
      groups.agg(
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("_vals") > 1L, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_groups"))
        .select(lit(det.mkString(",")).as("determinant"),
          lit(dep).as("dependent"), col("n_groups"),
          col("n_violating_groups"),
          (col("n_violating_groups") === 0L).as("holds"))
    }.reduce(_ unionByName _)
      .orderBy("determinant", "dependent")
  }

  /** `(groupCols…, col_name, n, n_null, n_distinct, vmin, vmax)` — one row
    * per profiled numeric column per group, all columns profiled in ONE
    * scan and unpivoted from the single result row per group.
    * `n_distinct` is exact (nulls excluded); multiple exact distincts
    * make Catalyst Expand the input ×(columns+1) — linear, one scan,
    * but at 100 TB swap in `approx_count_distinct` (HLL, no Expand) per
    * the q57/q93 pattern when exactness stops paying. vmin/vmax are the
    * raw values cast to double, untouched by arithmetic. */
  def summary(
      df: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String]
  ): DataFrame = {
    require(valueCols.nonEmpty, "at least one column to profile")
    val aggs = count(lit(1)).as("_n") +: valueCols.zipWithIndex.flatMap {
      case (c, i) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_null$i"),
        countDistinct(col(c)).as(s"_nd$i"),
        min(col(c)).cast("double").as(s"_min$i"),
        max(col(c)).cast("double").as(s"_max$i"))
    }
    val one = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val kvs = valueCols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"_null$i").as("n_null"),
        col(s"_nd$i").as("n_distinct"), col(s"_min$i").as("vmin"),
        col(s"_max$i").as("vmax"))
    }
    one.select(groupCols.map(col) ++ Seq(col("_n"), explode(array(kvs: _*)).as("kv")): _*)
      .select(groupCols.map(col) ++ Seq(col("kv.col_name").as("col_name"),
        col("_n").as("n"), col("kv.n_null").as("n_null"),
        col("kv.n_distinct").as("n_distinct"),
        col("kv.vmin").as("vmin"), col("kv.vmax").as("vmax")): _*)
      .orderBy(groupCols.map(col) :+ col("col_name"): _*)
  }
}
