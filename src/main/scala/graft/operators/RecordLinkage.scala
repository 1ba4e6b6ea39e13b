package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PROBABILISTIC RECORD LINKAGE (Fellegi & Sunter '69): match records
  * across two files that share no reliable key by scoring per-field
  * agreement with log-odds weights — agreement on a discriminating field
  * (phone) earns a large positive weight ln(m/u), disagreement a negative
  * ln((1−m)/(1−u)) — summing to a match score classified by two
  * thresholds into match / possible (clerical review) / non-match. The
  * classical engine behind entity resolution, CDC patient linking, and
  * dedup across ingestion feeds.
  *
  * Weights here are CALLER-PINNED integers (per-myriad log-odds): the
  * EM estimation step of m/u probabilities is a separate concern — a
  * production deployment estimates them offline and pins them, which is
  * exactly what a deterministic, engine-replayable audit needs.
  *
  * Scale shape: candidate generation is a BLOCKED equi-join — the only
  * shuffle is on the blocking key, so pair count is Σ_b |L_b|·|R_b|,
  * never |L|·|R|; pick block keys that survive the expected corruptions
  * (a truncated address keeps its first character) and bound the largest
  * block. The best-candidate selection is a window partitioned by the
  * left key — bounded by that record's block, not by the data. All
  * comparisons are null-safe equality (`<=>`): absent vs absent agrees,
  * absent vs present disagrees, so partial records score conservatively
  * instead of erroring.
  */
object RecordLinkage {

  /** One comparison field: null-safe agreement earns `agree`,
    * anything else `disagree` (both per-myriad log-odds, integers). */
  final case class FieldWeight(field: String, agree: Long, disagree: Long)

  /** Link every left record to its best-scoring block candidate.
    *
    * @param left      the incoming (dirty) file; must carry `leftKey`,
    *                  the block columns, and every compared field
    * @param right     the reference (clean) file, same column names
    * @param blockCols equality blocking keys (candidate pairs only form
    *                  within a block)
    * @param fields    compared fields with their pinned weights
    * @param upper     score ≥ upper ⇒ 'match'
    * @param lower     upper > score ≥ lower ⇒ 'possible'
    * @return one row per left record that has ≥1 block candidate:
    *         leftKey, cand_<rightKey>, agreement bit-pattern, score,
    *         decision — ties broken on the smallest right key
    */
  def linkBest(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      blockCols: Seq[String],
      fields: Seq[FieldWeight],
      upper: Long,
      lower: Long
  ): DataFrame = {
    require(fields.nonEmpty && upper >= lower, "need fields and upper >= lower")
    val renames = (rightKey +: fields.map(_.field)).distinct
    val r = renames.foldLeft(right.select((blockCols ++ renames).map(col): _*)) {
      (df, c) => df.withColumnRenamed(c, c + "_r")
    }
    val joined = left.join(r, blockCols, "inner")
    val score = fields.map { fw =>
      when(col(fw.field) <=> col(fw.field + "_r"), lit(fw.agree))
        .otherwise(lit(fw.disagree))
    }.reduce(_ + _)
    val pattern = concat(fields.map { fw =>
      when(col(fw.field) <=> col(fw.field + "_r"), lit("1")).otherwise(lit("0"))
    }: _*)
    val w = Window.partitionBy(col(leftKey))
      .orderBy(col("score").desc, col(rightKey + "_r").asc)
    joined
      .withColumn("score", score)
      .withColumn("agreement", pattern)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(leftKey), col(rightKey + "_r").as(s"cand_$rightKey"),
        col("agreement"), col("score"),
        when(col("score") >= upper, lit("match"))
          .when(col("score") >= lower, lit("possible"))
          .otherwise(lit("non_match")).as("decision"))
      .orderBy(col(leftKey))
  }

  /** [[linkBest]] with a BLOCK-SIZE CAP on the reference side: every
    * block whose reference membership exceeds `blockCap` is dropped
    * BEFORE the candidate join (the BucketCap aggregate + broadcast
    * anti-join — the same bound every banded pair operator in this
    * library uses), so the join output is ≤ Σ_b |L_b|·cap — LINEAR in
    * the left file even when a blocking key degenerates. The cost is
    * recall on exactly the dropped blocks' records: pair
    * [[blockCensus]] with this (the q320 pattern) so the loss is a
    * reported number, never a silent one. q164 keeps the uncapped
    * pinned-geometry form (it is the exactness instrument);
    * q322/q323 are the capped, censused scale path. */
  def linkBestCapped(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String,
      blockCols: Seq[String],
      fields: Seq[FieldWeight],
      upper: Long,
      lower: Long,
      blockCap: Int
  ): DataFrame = {
    require(blockCap > 0, "blockCap must be positive")
    linkBest(left, leftKey, BucketCap.dropOverCap(right, blockCols, blockCap),
      rightKey, blockCols, fields, upper, lower)
  }

  /** The honesty meter for [[linkBestCapped]]: one row of totals —
    * reference blocks, the largest block, blocks over `blockCap`, the
    * reference rows those blocks hold (all dropped by the cap), and the
    * LEFT records whose block was dropped (they leave the capped link
    * output entirely — the recall cost a corpus owner signs off on
    * before trusting the capped decisions). One aggregate per side over
    * the block key; the left probe of the over-cap set is the same
    * broadcast the cap itself uses. */
  def blockCensus(
      left: DataFrame,
      right: DataFrame,
      blockCols: Seq[String],
      blockCap: Int
  ): DataFrame = {
    require(blockCap > 0, "blockCap must be positive")
    val keys = blockCols.map(col)
    val sizes = right.groupBy(keys: _*).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds totals AND the over-cap probe
    val over = sizes.filter(col("n") > blockCap)
    val affected = left.join(
        broadcast(over.select(keys: _*)), blockCols, "left_semi")
      .agg(count(lit(1)).as("left_affected"))
    sizes.agg(
        count(lit(1)).as("n_blocks"),
        max(col("n")).as("max_block"),
        coalesce(sum(when(col("n") > blockCap, 1L).otherwise(0L)), lit(0L))
          .as("over_cap_blocks"),
        coalesce(sum(when(col("n") > blockCap, col("n")).otherwise(0L)),
          lit(0L)).as("rows_dropped"))
      .select(lit(blockCap.toLong).as("block_cap"), col("n_blocks"),
        col("max_block"), col("over_cap_blocks"), col("rows_dropped"))
      .crossJoin(affected) // both sides are single aggregate rows
  }
}
