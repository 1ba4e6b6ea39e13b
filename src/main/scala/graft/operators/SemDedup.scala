package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity.{HyperplaneLsh, IvfIndex}

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): partition the embedding space into cells, score
  * pairwise cosine only WITHIN a cell, and from every duplicate relation
  * keep the member least similar to the cell's representative — the
  * paper's keep-low-centroid-similarity policy, which retains the most
  * atypical copy of each semantic duplicate group and discards the
  * redundant ones.
  *
  * Removal rule (matches the reference implementation's sorted sweep): a
  * member x is removed iff some same-cell member y has cos(x, y) ≥
  * `threshold` and y precedes x in the cell ordering (centrality ASC,
  * id ASC). y need not itself survive — the sweep compares against all
  * prior members, not the kept set, so the decision is a pure pairwise
  * predicate with no iterative dependency.
  *
  * Output: one row per input row — (id, cell, centrality, kept) — a
  * decision table, so callers can either filter `kept` or audit removal
  * rates per cell/source.
  *
  * Scale posture (the reason this beats all-pairs near-dup at 100 TB):
  *  - cell assignment is a per-row projection (no shuffle);
  *  - the only data shuffle is ONE hash partition of
  *    (id, cell, unit-normalized embedding) on cell for the within-cell
  *    self-join — at 64 dims × 8 B that is ~0.5 KB/row regardless of
  *    document size; text never travels;
  *  - candidate volume is Σ_cells n_c², bounded by `cellCap` against
  *    degenerate cells (over-cap cells SKIP dedup — every member is kept
  *    and flagged rather than silently dropped, the conservative failure
  *    mode for a curation pipeline);
  *  - the removed-id set and the final flag join shuffle ids only.
  *
  * Size cells with [[Similarity.recommendedBits]] (LSH) or k ≈
  * n/targetCellSize (IVF); the paper uses ~100k clusters for 5B
  * embeddings, i.e. cells of ~50k — cellCap exists for the tail, not the
  * typical cell.
  */
object SemDedup {

  /** Decision table over a prepared (id, cell, centrality, __ne) frame.
    * `prepared` must already be materialized (localCheckpoint) — it fans
    * out four ways below, and the signature/normalization HOF expressions
    * must not be re-planned per branch. */
  private def decide(prepared: DataFrame, threshold: Double, cellCap: Int): DataFrame = {
    // over-cap cells: aggregate + broadcast join, never a count-window —
    // there are < n/cellCap of them by construction (see BucketCap)
    val over = prepared.groupBy("cell").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cellCap)
      .select(col("cell"), lit(true).as("cell_capped"))
    val flagged = prepared.join(broadcast(over), Seq("cell"), "left")
      .withColumn("cell_capped", coalesce(col("cell_capped"), lit(false)))
    val members = flagged.filter(!col("cell_capped"))
      .select(col("id"), col("cell"), col("centrality"), col("__ne"))
    val others = members.select(col("cell"), col("id").as("__o_id"),
      col("centrality").as("__o_centrality"), col("__ne").as("__o_ne"))
    val removed = members.join(others, Seq("cell"))
      .filter(col("id") =!= col("__o_id") &&
        (col("__o_centrality") < col("centrality") ||
          (col("__o_centrality") === col("centrality") && col("__o_id") < col("id"))) &&
        Similarity.dot(col("__ne"), col("__o_ne")) >= threshold)
      .select(col("id")).distinct()
      .withColumn("__removed", lit(true))
    flagged.join(removed, Seq("id"), "left")
      .select(col("id"), col("cell"), col("centrality"),
        coalesce(!col("__removed"), lit(true)).as("kept"))
  }

  /** Deterministic-cell variant: cells are hyperplane-LSH signatures
    * (seed literals), the cell representative is the member with the
    * minimum id, and centrality is cosine to that anchor. Everything is
    * a pure function of the data and the seed, so the whole decision
    * table replays in an external engine — the auditable form (q75's
    * hash-exact oracle). Anchor similarity is a proxy for centroid
    * similarity: both order members by typicality relative to a fixed
    * point of the cell. */
  def lshSemanticDedup(
      df: DataFrame,
      embCol: String,
      idCol: String,
      lsh: HyperplaneLsh,
      threshold: Double,
      cellCap: Int = 10000
  ): DataFrame = {
    val sigs = df.select(col(idCol).as("id"),
        lsh.signature(col(embCol)).as("cell"),
        Similarity.normalized(col(embCol)).as("__ne"))
      .localCheckpoint(true) // sig + normalize computed once; lineage cut before fan-out
    val anchorIds = sigs.groupBy("cell").agg(min(col("id")).as("__aid"))
    // one row per cell — broadcast to attach the anchor vector per member
    val anchors = anchorIds
      .join(sigs.select(col("id").as("__aid"), col("__ne").as("__ane")), Seq("__aid"))
      .select(col("cell"), col("__ane"))
    val prepared = sigs.join(broadcast(anchors), Seq("cell"))
      .withColumn("centrality", Similarity.dot(col("__ne"), col("__ane")))
      .select(col("id"), col("cell"), col("centrality"), col("__ne"))
    decide(prepared, threshold, cellCap)
  }

  /** Embedding-space stratified downsample: keep the `perCell` members of
    * each LSH cell LEAST similar to the cell's min-id anchor — a
    * diversity-preserving budget cut (redundant near-anchor copies go
    * first, outliers survive), the complement of [[lshSemanticDedup]]'s
    * threshold rule when the budget, not a similarity bar, is the
    * constraint. Column-value strata (source, lang) are
    * `Sampling.stratifiedSample`'s job; this stratifies the semantic
    * space itself.
    *
    * Same determinism story as the dedup: cells, anchors and centrality
    * replay externally, ranking is (centrality ASC, id ASC) — q78's
    * hash-exact oracle. One shuffle on cell for the rank window (the
    * anchor attach is a broadcast); cell count scales with
    * [[Similarity.recommendedBits]] so windows stay small. */
  def cellCoverageSample(
      df: DataFrame,
      embCol: String,
      idCol: String,
      lsh: HyperplaneLsh,
      perCell: Int
  ): DataFrame = {
    require(perCell > 0)
    val sigs = df.select(col(idCol).as("id"),
        lsh.signature(col(embCol)).as("cell"),
        Similarity.normalized(col(embCol)).as("__ne"))
      .localCheckpoint(true) // sig + normalize once; lineage cut before the triple fan-out
    val anchorIds = sigs.groupBy("cell").agg(min(col("id")).as("__aid"))
    val anchors = anchorIds
      .join(sigs.select(col("id").as("__aid"), col("__ne").as("__ane")), Seq("__aid"))
      .select(col("cell"), col("__ane"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(col("centrality").asc, col("id").asc)
    sigs.join(broadcast(anchors), Seq("cell"))
      .withColumn("centrality", Similarity.dot(col("__ne"), col("__ane")))
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= perCell)
      .select(col("id"), col("cell"), col("centrality"), col("cell_rank"))
  }

  /** Paper-faithful variant: cells are trained IVF k-means cells and
    * centrality is cosine to the cell's actual centroid (a literal from
    * training, attached by broadcast join). Data-adaptive — the cells
    * follow the corpus's cluster structure — at the cost of the training
    * pass and an externally-unreproducible oracle (centroids depend on
    * the data, so the contract check is spec-level, not SQL-level). */
  def ivfSemanticDedup(
      df: DataFrame,
      embCol: String,
      idCol: String,
      index: IvfIndex,
      threshold: Double,
      cellCap: Int = 10000
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cell", "__cent")
    val prepared = df.select(col(idCol).as("id"),
        index.assign(col(embCol)).as("cell"),
        Similarity.normalized(col(embCol)).as("__ne"))
      .localCheckpoint(true)
      .join(broadcast(cents), Seq("cell"))
      .withColumn("centrality", Similarity.cosine(col("__ne"), col("__cent")))
      .select(col("id"), col("cell"), col("centrality"), col("__ne"))
    decide(prepared, threshold, cellCap)
  }
}
