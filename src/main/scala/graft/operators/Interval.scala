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

  /** [[unionCoverage]] re-expressed as a PACKED-SERIES AGGREGATE — the
    * streaming-compatible twin (the Trend.ewmaSeries design): window
    * functions cannot run in a streaming aggregation, but
    * `sort_array(collect_list(...))` + one `aggregate` fold can, so the
    * same census maintains live under `outputMode("complete")` with the
    * per-key interval list as state. The fold carries
    * (covered, spans, longest, current island [lo, hi)) over the
    * (start, end)-sorted list and closes the last island in the finish.
    * State per key = that key's interval count — the identical envelope
    * as the window form, just held in the agg state store instead of a
    * window frame. Long columns; identical output schema, and
    * IntervalSpec pins fold ≡ window on a randomized frame. */
  def unionCoverageAgg(df: DataFrame, keyCol: String,
                       startCol: String, endCol: String): DataFrame = {
    val z = "CAST(NULL AS BIGINT)"
    df.select(col(keyCol), col(startCol).cast("long").as("st"),
        col(endCol).cast("long").as("en"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("st"), col("en")))).as("_ivs"))
      .withColumn("_r", expr(
        s"""aggregate(_ivs,
           |  named_struct('cov', 0L, 'spans', 0L, 'longest', 0L,
           |               'lo', $z, 'hi', $z),
           |  (a, x) -> CASE
           |    WHEN a.hi IS NULL THEN named_struct('cov', a.cov,
           |      'spans', a.spans, 'longest', a.longest,
           |      'lo', x.st, 'hi', x.en)
           |    WHEN x.st > a.hi THEN named_struct(
           |      'cov', a.cov + a.hi - a.lo, 'spans', a.spans + 1L,
           |      'longest', greatest(a.longest, a.hi - a.lo),
           |      'lo', x.st, 'hi', x.en)
           |    ELSE named_struct('cov', a.cov, 'spans', a.spans,
           |      'longest', a.longest, 'lo', a.lo,
           |      'hi', greatest(a.hi, x.en)) END,
           |  a -> named_struct(
           |    'covered', a.cov + a.hi - a.lo,
           |    'n_spans', a.spans + 1L,
           |    'longest_span', greatest(a.longest, a.hi - a.lo)))"""
          .stripMargin.replace("\n", " ")))
      .select(col(keyCol), size(col("_ivs")).cast("long").as("n_events"),
        col("_r.n_spans").as("n_spans"), col("_r.covered").as("covered"),
        col("_r.longest_span").as("longest_span"))
  }

  /** INTERVAL × INTERVAL OVERLAP JOIN at scale — all pairs (l, r) with
    * half-open overlap `l.start < r.end AND r.start < l.end`. Spark
    * plans the naive two-inequality join as a BroadcastNestedLoopJoin /
    * cartesian — O(|L|·|R|) and un-broadcastable once either side
    * outgrows memory. Bucketing restores an equi-join (the q53
    * point-in-interval trick, extended to interval-vs-interval):
    * each interval explodes to the fixed-width buckets it covers
    * (half-open: start DIV W .. (end-1) DIV W), the join key is the
    * bucket, and the exact overlap predicate filters candidates.
    *
    * Exactly-once without a distinct pass: an overlapping pair co-covers
    * every bucket in the overlap range, so candidates would multiply —
    * instead keep the single MEET bucket, the one holding
    * max(l.start, r.start). floor-division is monotonic, so that bucket
    * is `greatest(l_start_bucket, r_start_bucket)`, both sides provably
    * cover it when the pair overlaps, and no other kept bucket exists.
    * One row per overlapping pair, no row ever deduplicated.
    *
    * Shuffle volume: Σ len/W + 1 per interval per side — pick W near the
    * median interval length so most intervals cover ≤2 buckets.
    * `maxBucketsPerInterval` fails LOUDLY on a degenerate interval (an
    * open-ended sentinel) that would otherwise explode the job. Times
    * must be non-negative (floor(x/W) ≠ x DIV W below zero) — enforced
    * per row inside the same raise_error guard. */
  def overlapJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucket: Long,
      maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"overlapJoin: sides share column names $shared — rename one side")
    require(!(left.columns ++ right.columns).exists(Set("__bk", "__lsb", "__rsb")),
      "overlapJoin reserves __bk/__lsb/__rsb")
    def exploded(df: DataFrame, s: String, e: String, sb: String) = {
      val lo = floor(col(s) / bucket)
      val hi = floor((col(e) - 1) / bucket)
      val n = hi - lo + lit(1)
      df.withColumn(sb, lo.cast("long"))
        .withColumn("__bk", explode(
          // `e <= s` (empty/degenerate) must fail REGARDLESS of bucket
          // alignment: when s is a bucket multiple n=0 already trips
          // `n < 1`, but otherwise n=1 and the strict overlap predicate
          // downstream would happily pair a mathematically empty
          // interval — so the emptiness check is explicit, not an
          // artifact of where the bucket edges fall
          when(n > maxBucketsPerInterval || n < 1 || col(s) < 0 ||
              col(e) <= col(s), raise_error(concat(
            lit(s"overlapJoin: empty, negative, or >$maxBucketsPerInterval-bucket interval: "),
            col(s).cast("string"), lit(".."), col(e).cast("string"))))
          .otherwise(sequence(lo, hi))))
    }
    val l = exploded(left, lStart, lEnd, "__lsb")
    val r = exploded(right, rStart, rEnd, "__rsb").withColumnRenamed("__bk", "__bk2")
    l.join(r, l("__bk") === r("__bk2"))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__bk") === greatest(col("__lsb"), col("__rsb")))
      .drop("__bk", "__bk2", "__lsb", "__rsb")
  }
}
