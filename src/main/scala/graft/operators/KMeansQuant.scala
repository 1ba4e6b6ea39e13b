package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LLOYD'S K-MEANS over an embedding column, ENGINE-EXACT BY
  * CONSTRUCTION — the clustering pass a training-data pipeline runs for
  * diversity balancing, stratified selection and per-cluster sampling
  * quotas (the "cluster then sample" recipe), built on the q127/q61
  * integer discipline so every iteration replays bit-identically in an
  * external engine:
  *
  *   - vectors QUANTIZE to integer units (round(x · 2^20),
  *     half-away-from-zero — identical in Spark and DuckDB);
  *   - distances are exact integer sums of squared differences
  *     (dim · (2·2^20)² ≪ 2^63 — no float order-dependence anywhere);
  *   - centroid updates are exact integer element sums (order-free,
  *     map-side combined) FLOOR-DIVIDED by the cluster count —
  *     `Math.floorDiv` on the driver, the `(s − pmod(s, n)) / n`
  *     identity in SQL — so the next iteration's centroids are integers
  *     again;
  *   - argmin ties break to the LOWER cluster id (the q35 argmax
  *     discipline), initial centroids are PINNED to caller-chosen
  *     vector ids (the q35/q131 fixture discipline).
  *
  * Scale shape (100 TB): per iteration, the assignment is a ZERO-SHUFFLE
  * scan — centroids travel as k×dim broadcast literals, each row
  * computes k codegen'd integer distances — and the update is one
  * posexplode → groupBy(cluster, dim) with map-side combine, so the only
  * shuffle carries ≤ k·dim·partitions partial sums; the k×dim result
  * (KBs) collects to the driver exactly as Spark MLlib's own k-means
  * does. Iterations are a fixed count — the caller pins compute cost
  * rather than chasing convergence on a moving corpus. */
object KMeansQuant {

  /** Quantization scale: 2^20 integer units per 1.0. */
  val Scale: Long = 1L << 20

  /** Rows with null ids or empty embeddings are DROPPED — they have no
    * direction to cluster, and the SQL replay's unnest never sees them,
    * so keeping them would make the two engines disagree. */
  private def quantized(df: DataFrame, embCol: String, idCol: String): DataFrame =
    df.filter(col(idCol).isNotNull && size(col(embCol)) > 0)
      .select(col(idCol).cast("long").as("vec_id"),
        transform(col(embCol),
          x => round(x.cast("double") * lit(Scale.toDouble)).cast("long")).as("xq"))

  /** Exact integer squared distance of `xq` to the literal centroid. */
  private def dist2(c: Array[Long]): Column =
    aggregate(
      zip_with(col("xq"), array(c.map(lit).toIndexedSeq: _*),
        (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  /** `(vec_id, cluster, dist2q)` after `iters` Lloyd rounds from
    * centroids pinned to `initIds`' quantized embeddings (cluster i
    * starts at initIds(i)). Empty clusters keep their previous centroid.
    * Totally ordered by vec_id; `dist2q` is the exact integer squared
    * distance to the final centroid in quantized units. */
  def lloydAssign(
      df: DataFrame,
      embCol: String,
      idCol: String,
      initIds: Seq[Long],
      iters: Int
  ): DataFrame = {
    val (qv, cents) = fit(df, embCol, idCol, initIds, iters)
    qv.withColumn("b", best(cents))
      .select(col("vec_id"), col("b.c").as("cluster"), col("b.d").as("dist2q"))
      .orderBy("vec_id")
  }

  /** The Lloyd loop itself: returns the checkpointed quantized frame and
    * the final k×dim integer centroids (the bounded driver state both
    * [[lloydAssign]] and [[silhouetteReport]] score against). */
  private def fit(
      df: DataFrame,
      embCol: String,
      idCol: String,
      initIds: Seq[Long],
      iters: Int
  ): (DataFrame, IndexedSeq[Array[Long]]) = {
    require(initIds.nonEmpty && initIds.distinct.size == initIds.size,
      "initIds must be non-empty and distinct")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val qv = quantized(df, embCol, idCol)
      .localCheckpoint(true) // scanned once per iteration, not re-derived
    // pinned init: the quantized embeddings of initIds, in initIds order
    val initCollected = qv.filter(col("vec_id").isin(initIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    require(initCollected.length == initIds.size, {
      val seen = initCollected.map(_._1)
      val missing = initIds.filterNot(seen.contains)
      if (missing.nonEmpty) s"missing init vectors: ${missing.mkString(",")}"
      else "duplicate init vector ids in the input — initialization would be nondeterministic"
    })
    val initRows = initCollected.toMap
    var cents: IndexedSeq[Array[Long]] = initIds.map(initRows).toIndexedSeq

    for (_ <- 1 to iters) {
      // one bounded shuffle (≤ k·dim·partitions partial sums) + one
      // k×dim collect — the MLlib update shape
      val sums = qv.withColumn("b", best(cents))
        .select(col("b.c").as("c"), posexplode(col("xq")).as(Seq("j", "v")))
        .groupBy("c", "j").agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getLong(0))
      cents = cents.zipWithIndex.map { case (prev, i) =>
        byCluster.get(i.toLong) match {
          case None => prev // empty cluster: centroid carries over
          case Some(rows) =>
            rows.sortBy(_.getInt(1))
              .map(r => Math.floorDiv(r.getLong(2), r.getLong(3))).toArray
        }
      }
    }
    (qv, cents)
  }

  private def best(cs: IndexedSeq[Array[Long]]): Column =
    // struct(d, c): array_min orders by field order → ties to lower c
    array_min(array(cs.zipWithIndex.map { case (c, i) =>
      struct(dist2(c).as("d"), lit(i.toLong).as("c"))
    }: _*))

  /** SIMPLIFIED (centroid) SILHOUETTE per cluster — the scalable cluster-
    * quality audit: per point, a² = squared distance to its OWN (nearest)
    * centroid and b² = squared distance to the NEAREST OTHER centroid,
    * s = (b²−a²)/b² in per-myriad (the squared-distance variant,
    * documented; b² ≥ a² by construction so max(a², b²) = b²). Classical
    * silhouette needs all point-pair distances — O(n²) and dead at scale;
    * the centroid form is one scan over broadcast k×dim literals with
    * EXACT integer arithmetic end to end (quantized coordinates, integer
    * squared distances, truncating per-myriad division), so it
    * hash-matches any engine. s ≈ 0 ⇒ the point sits on a cluster
    * boundary; per-cluster mean near 0 ⇒ that cluster is not separated.
    *
    * Tie semantics: centroids are ranked by (distance, index) — a point
    * equidistant to two centroids has b² = a² and scores 0, the honest
    * "on the boundary" answer.
    *
    * @return per cluster: n, mean_s_pm, min_s_pm, max_s_pm */
  def silhouetteReport(
      df: DataFrame,
      embCol: String,
      idCol: String,
      initIds: Seq[Long],
      iters: Int
  ): DataFrame = {
    require(initIds.size >= 2, "silhouette needs k >= 2")
    val (qv, cents) = fit(df, embCol, idCol, initIds, iters)
    val ranked = array_sort(array(cents.zipWithIndex.map { case (c, i) =>
      struct(dist2(c).as("d"), lit(i.toLong).as("c"))
    }: _*))
    val sPm = qv.withColumn("r", ranked)
      .select(col("r")(0).getField("c").as("cluster"),
        col("r")(0).getField("d").as("a2"),
        col("r")(1).getField("d").as("b2"))
      .select(col("cluster"),
        when(col("b2") > 0,
          expr("CAST(b2 - a2 AS DECIMAL(38,0)) * 10000 DIV b2"))
          .otherwise(0L).as("s_pm"))
    sPm.groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        expr("sum(s_pm) DIV count(1)").as("mean_s_pm"),
        min(col("s_pm")).as("min_s_pm"), max(col("s_pm")).as("max_s_pm"))
      .orderBy("cluster")
  }
}
