package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join at scale: points t join intervals
  * [start, end] with start ≤ t ≤ end. Spark plans the naive inequality
  * join as a BroadcastNestedLoop/cartesian — O(|P|·|I|) and
  * un-broadcastable once intervals outgrow memory. Binning restores an
  * equi-join: every interval explodes to the fixed-width bins it covers,
  * every point maps to exactly ONE bin, the join key is the bin, and the
  * exact containment predicate filters the candidates. A (point,
  * interval) pair meets in exactly one bin (the point's), so no dedup
  * pass is needed.
  *
  * Shuffle volume: |points| + Σ(interval_len/binSize + 1) — pick binSize
  * near the median interval length so most intervals cover ≤2 bins.
  * `maxBinsPerInterval` fails LOUDLY on a degenerate interval (e.g. an
  * open-ended sentinel timestamp) that would otherwise explode the job.
  */
object RangeJoin {

  def rangeJoin(
      points: DataFrame,
      tCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binSize: Long,
      maxBinsPerInterval: Int = 10000
  ): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    require(!(points.columns ++ intervals.columns).contains("__bin"),
      "rangeJoin reserves the __bin column name")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"rangeJoin: points and intervals share column names $shared — rename one side")
    val p = points.withColumn("__bin", floor(col(tCol) / binSize))
    val nBins = floor(col(endCol) / binSize) - floor(col(startCol) / binSize) + 1
    // nBins < 1 catches reversed/sentinel intervals, which would otherwise
    // hit sequence()'s implicit step -1 and explode DESCENDING
    val i = intervals
      .withColumn("__bin", explode(
        when(nBins > maxBinsPerInterval || nBins < 1, raise_error(concat(
          lit(s"rangeJoin: interval outside 1..$maxBinsPerInterval bins: "),
          col(startCol).cast("string"), lit(".."), col(endCol).cast("string"))))
        .otherwise(sequence(floor(col(startCol) / binSize), floor(col(endCol) / binSize)))))
    p.join(i, "__bin")
      .filter(col(tCol) >= col(startCol) && col(tCol) <= col(endCol))
      .drop("__bin")
  }
}
