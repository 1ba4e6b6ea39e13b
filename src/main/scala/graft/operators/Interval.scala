package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INTERVAL-UNION COVERAGE — per key, the total length of the UNION of
  * possibly-overlapping half-open intervals [start, end), plus the
  * merged-span census. The classic "how much wall-clock was this user
  * actually active" question that naive `sum(end - start)` double-counts
  * whenever sessions overlap (parallel tabs, retried jobs, overlapping
  * on-call shifts): the union is the honest number, and the
  * spans-vs-events ratio is the overlap diagnostic.
  *
  * Algorithm: the gaps-and-islands form done with ONLY key-partitioned
  * windows (the q39 sessionization discipline — no data-sized global
  * frame anywhere). Per key, intervals sort by (start, end); an interval
  * OPENS a new island iff its start clears the running maximum of all
  * previous ends (`max(end) ROWS UNBOUNDED PRECEDING..1 PRECEDING` —
  * strictly-before frame, so an interval never sees its own end);
  * islands are the running sum of the open flags; a group-by on
  * (key, island) yields each merged span's [min(start), max(end)), and a
  * second group-by on key rolls the census up. Ties on (start, end) are
  * interchangeable rows — any order produces the same islands — so the
  * result is deterministic without a tiebreak column.
  *
  * Scale shape: two key-partitioned window passes + two map-side-
  * combined aggregates, all sharing the hash-partition on key; per-key
  * data is the only frame any window ever holds. 100 TB of events with
  * a hot key degrades to that key's row count — the same envelope as
  * sessionization, and the same salting remedy applies upstream if a
  * single key genuinely exceeds an executor.
  *
  * Output: one row per key — `n_events` (input intervals), `n_spans`
  * (merged islands), `covered` (union length, in the caller's time
  * unit), `longest_span` (the largest single island — burst diagnostic).
  */
object Interval {

  def unionCoverage(df: DataFrame, keyCol: String,
                    startCol: String, endCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol).asc, col(endCol).asc)
    val prevMax = max(col(endCol))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df.withColumn("_open",
      when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
    val islands = flagged.withColumn("_isl",
      sum(col("_open")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands
      .groupBy(col(keyCol), col("_isl"))
      .agg(min(col(startCol)).as("_lo"), max(col(endCol)).as("_hi"),
        count(lit(1)).as("_n"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("_n")).as("n_events"),
        count(lit(1)).as("n_spans"),
        sum(col("_hi") - col("_lo")).as("covered"),
        max(col("_hi") - col("_lo")).as("longest_span"))
  }
}
