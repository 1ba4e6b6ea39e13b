package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BLOCKING-QUALITY AUDIT — the two numbers every entity-resolution /
  * dedup blocking scheme must publish before anyone trusts it:
  *
  *   reduction ratio    = 1 − candidate_pairs / total_pairs
  *     (how much of the O(n²) comparison space the blocks eliminate)
  *   pair completeness  = co-blocked true pairs / true pairs
  *     (how many KNOWN duplicate pairs still land in a common block —
  *      the recall the downstream matcher can at best achieve)
  *
  * A scheme is only as good as BOTH: trivial blocks (everything in one
  * bucket) have completeness 1 but reduction 0; over-sharp blocks
  * reduce brilliantly and silently drop the very pairs the pipeline
  * exists to find. This is the q231/q232 measured-instrument discipline
  * pointed at the blocking stage itself.
  *
  * Scale shape: NO pair is ever materialized — every pair count is
  * group-size combinatorics. Candidate pairs = Σ_b C(size_b, 2) off a
  * block-size aggregate; true pairs = Σ_g C(size_g, 2) off a truth-key
  * aggregate; co-blocked true pairs = Σ_{g,b} C(size, 2) off the
  * (truth, block) aggregate — three map-side-combined shuffles whose
  * output is bounded by the number of DISTINCT blocks/truth groups,
  * never the corpus, and nothing downstream exceeds those frames. Per-
  * group pair counts stay in BIGINT (a single block would need >3×10⁹
  * members to overflow — already a broken scheme); the corpus-level
  * sums and the C(n,2) denominator run INTERNALLY in DECIMAL(38,0)
  * because at 10¹² rows total_pairs ≈ 5×10²³ is past int64. Ratios are
  * truncating permyriad via the DECIMAL(38,0) DIV convention
  * (bit-identical to DuckDB HUGEINT //).
  *
  * READOUT convention: the emitted pair counters are BIGINT — the
  * 128-bit width is an internal arithmetic detail, and a decimal
  * readout hashes differently across engines (pandas renders Spark's
  * decimal128 as `Decimal` objects but DuckDB's as float64 — equal
  * values, different typed hashes, the round-9 gate lesson). The cast
  * is exact up to ~4.3×10⁹ corpus rows (total_pairs < 2⁶³); past that
  * a caller auditing a full 10¹²-row corpus should bucket the audit
  * (e.g. per shard) — the ratios, which always fit, compose from the
  * decimal internals unchanged. The narrowing is GUARDED: a counter
  * past Long.MaxValue raises instead of the silent NULL a non-ANSI
  * session's decimal→long cast would produce (advisor r10 — the
  * fail-loudly discipline of hits' resolution floor applied here).
  *
  * @param df       one row per record
  * @param truthCol ground-truth duplicate key (e.g. canonical content
  *                 fingerprint): rows sharing it ARE duplicates
  * @param blockCol the blocking key under audit
  * @return ONE row: n_rows, total_pairs, cand_pairs, true_pairs,
  *         coblocked_pairs (pair counts BIGINT, exact — see the
  *         readout-convention note above), reduction_pm,
  *         completeness_pm (truncating permyriad; completeness NULL
  *         when there are no true pairs)
  */
object BlockingAudit {

  /** Guarded DECIMAL(38,0)→BIGINT narrowing: raises past Long.MaxValue
    * (where a non-ANSI cast silently NULLs) — shared with RankAgree. */
  private[operators] def narrowChecked(c: org.apache.spark.sql.Column,
                                       what: String): org.apache.spark.sql.Column =
    when(c > lit("9223372036854775807").cast("decimal(38,0)"),
      raise_error(concat(
        lit(s"$what exceeds the BIGINT readout (counter past 2^63) — "),
        lit("bucket the computation (e.g. per shard; see scaladoc)"))))
      .otherwise(c.cast("long"))

  def audit(df: DataFrame, truthCol: String, blockCol: String): DataFrame = {
    val base = df.select(col(truthCol).as("_truth"), col(blockCol).as("_blk"))
      .localCheckpoint(true) // three census passes share one input scan
    def pairSum(grouped: DataFrame): DataFrame =
      grouped
        .withColumn("_p", expr("_c * (_c - 1) DIV 2"))
        .agg(coalesce(sum(col("_p").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("_pairs"))
    val tot = base.agg(count(lit(1)).as("n_rows"))
      .withColumn("total_pairs",
        // true decimal division, not DIV: DIV's long result would
        // overflow at 10¹² rows; n(n−1) is even so /2 is exact
        expr("CAST(CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1) / 2 " +
          "AS DECIMAL(38,0))"))
    val cand = pairSum(base.groupBy(col("_blk")).agg(count(lit(1)).as("_c")))
      .withColumnRenamed("_pairs", "cand_pairs")
    val truth = pairSum(base.groupBy(col("_truth")).agg(count(lit(1)).as("_c")))
      .withColumnRenamed("_pairs", "true_pairs")
    val cob = pairSum(base.groupBy(col("_truth"), col("_blk"))
        .agg(count(lit(1)).as("_c")))
      .withColumnRenamed("_pairs", "coblocked_pairs")
    tot.crossJoin(cand).crossJoin(truth).crossJoin(cob) // all 1-row scalars
      .withColumn("reduction_pm", expr(
        "CASE WHEN total_pairs > 0 THEN " +
          "10000 - (10000 * cand_pairs) DIV total_pairs END"))
      .withColumn("completeness_pm", expr(
        "CASE WHEN true_pairs > 0 THEN " +
          "(10000 * coblocked_pairs) DIV true_pairs END"))
      .select(col("n_rows"),
        narrowChecked(col("total_pairs"), "BlockingAudit: total_pairs")
          .as("total_pairs"),
        narrowChecked(col("cand_pairs"), "BlockingAudit: cand_pairs")
          .as("cand_pairs"),
        narrowChecked(col("true_pairs"), "BlockingAudit: true_pairs")
          .as("true_pairs"),
        narrowChecked(col("coblocked_pairs"), "BlockingAudit: coblocked_pairs")
          .as("coblocked_pairs"),
        col("reduction_pm").cast("long").as("reduction_pm"),
        col("completeness_pm").cast("long").as("completeness_pm"))
  }
}
