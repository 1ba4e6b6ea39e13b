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
}
