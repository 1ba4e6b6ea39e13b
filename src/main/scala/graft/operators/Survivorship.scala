package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GOLDEN-RECORD SURVIVORSHIP — collapse each duplicate cluster to one
  * merged record: for every attribute independently, the MODAL non-null
  * value across the cluster's members, ties broken to the SMALLEST value
  * — the deterministic version of "most sources agree, else first
  * alphabetically" that master-data merge rules start from. An attribute
  * with no non-null values in a cluster survives as null.
  *
  * Scale shape: per attribute, one map-side-combined (cluster, value)
  * count aggregate and one cluster-partitioned rank window over the
  * value-count table (clusters × per-cluster distinct values — far
  * smaller than the input); winners join back on the cluster key. The
  * member-count frame gates output to clusters with `minMembers`+
  * members. No windows or joins ever carry full rows — only (cluster,
  * value, count) triples.
  */
object Survivorship {

  /** `(cluster, n_members, attr…)` — one golden row per cluster with at
    * least `minMembers` members, ordered by cluster. */
  def goldenRecords(
      df: DataFrame,
      clusterCol: String,
      attrCols: Seq[String],
      minMembers: Long = 1L
  ): DataFrame = {
    require(attrCols.nonEmpty, "need at least one attribute to merge")
    require(minMembers >= 1L, "minMembers must be >= 1")
    val members = df.groupBy(col(clusterCol).as("cluster"))
      .agg(count(lit(1)).as("n_members"))
      .filter(col("n_members") >= minMembers)
    val winners = attrCols.map { a =>
      val byCluster = Window.partitionBy("cluster")
        .orderBy(col("_c").desc, col(a).asc)
      df.select(col(clusterCol).as("cluster"), col(a))
        .filter(col(a).isNotNull)
        .groupBy("cluster", a)
        .agg(count(lit(1)).as("_c"))
        .withColumn("_rn", row_number().over(byCluster))
        .filter(col("_rn") === 1)
        .select(col("cluster"), col(a))
    }
    winners.foldLeft(members)((acc, w) => acc.join(w, Seq("cluster"), "left"))
      .orderBy("cluster")
  }
}
