package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucket-size capping shared by every bucketed pair/join operator
  * (MinHash-LSH bands, SimHash chunks, hyperplane-LSH buckets): rows in a
  * bucket whose membership exceeds the cap are dropped BEFORE the
  * candidate self-join, bounding a degenerate corpus's join output.
  *
  * Implementation note (the r5→r6 lesson): the cap is an aggregate +
  * broadcast ANTI-join, never `count().over(Window.partitionBy(bucket))`.
  * The window form re-shuffles and fully materializes the input every
  * run even when no bucket is anywhere near the cap — on the knn-join's
  * corpus side that was a measured ~5× regression. The aggregate form is
  * map-side combined down to one row per bucket, the over-cap id set is
  * tiny BY CONSTRUCTION (an over-cap bucket holds > cap rows, so there
  * are fewer than N/cap of them — broadcastable at any corpus size with
  * a sane cap), and the anti-join is a map-side hash probe: the input
  * itself never shuffles.
  */
private[operators] object BucketCap {

  /** `df` minus all rows whose `keys` bucket has more than `cap` rows. */
  def dropOverCap(df: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val over = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > cap)
      .select(keys.map(col): _*)
    df.join(broadcast(over), keys, "left_anti")
  }
}
