package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.plans.SketchFunctions

/** DSIR-style DATA SELECTION via importance resampling (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * NeurIPS 2023): score every raw-pool document by how much more likely
  * its hashed-bigram features are under a TARGET distribution (a small
  * curated set) than under the RAW pool itself, then keep the top
  * fraction per stratum. This is the standard "make the crawl look like
  * the curated set" selection step of a pretraining pipeline.
  *
  * Model: both distributions are bag-of-hashed-bigram unigram models over
  * `buckets` hash buckets (the paper's hashed n-gram generative model),
  * Laplace-smoothed. A document's log importance weight is
  *   Σ_g ln P̂_target(b(g)) − ln P̂_raw(b(g))
  *     = Σ_g ln ((ct_b + 1) · (Nr + B)) / ((cr_b + 1) · (Nt + B))
  * over its gram OCCURRENCES (multiset, not distinct — the feature is a
  * count vector). Hashing is the dimensionality reduction: the count
  * tables are bucket-sized regardless of vocabulary, which is exactly
  * what lets them broadcast at any corpus scale.
  *
  * PORTABILITY: the gram→bucket map is the portable md5-slice hash
  * ([[graft.plans.PortableSketch.md5Long]] mod `buckets`) so an external
  * engine replays the same collisions, and the per-gram log terms are
  * quantized to integer micro-nats and summed exactly (the
  * [[Drift.tokenDrift]] quantize-then-sum construction, same boundary-
  * flip caveat). The ratio's numerator/denominator are exact-integer
  * products converted to double; a `require` guards the < 2^53 bound
  * (past it, pre-divide into two rounded doubles — a different
  * fingerprint — or shard, as in Drift).
  *
  * Scale shape: one tokenize+hash scan over the pool and one over the
  * target (8-byte gram hashes, never gram strings, off the scan);
  * both count tables are ≤ `buckets` rows and broadcast to the scoring
  * join, so the only data-sized shuffle is the per-doc aggregation on
  * id. Selection ranks within each stratum (per-source window — no
  * single-partition global sort), with the integer-exact quota test
  * `n·keepNum > (rank−1)·keepDen` ⇔ rank ≤ ceil(n·keepNum/keepDen).
  */
object Dsir {

  /** `(id, stratum, b)` one row per bigram occurrence (multiplicity-
    * preserving, token order; < 2 tokens → absent, consistent with
    * [[NgramLm.scoreDocs]]). Gram hashing is the native
    * [[graft.plans.PortableNgramHashes]] loop — md5("w1 w2") per
    * position, identical values to the md5-of-joined-string the oracle
    * replays, ~17× the throughput of the interpreted HOF formulation it
    * replaced (transform + element_at + concat_ws, the old q80
    * bottleneck: 5.4 s of its 8.5 s at sf0.1). */
  private def bucketStream(
      df: DataFrame, textCol: String, idCol: String, strataCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol).as("id"), col(strataCol).as("stratum"),
        explode(SketchFunctions.portableNgramHashes(
          TextAnalysis.tokens(col(textCol)), 2)).as("h"))
      .select(col("id"), col("stratum"), pmod(col("h"), lit(buckets.toLong)).as("b"))

  /** Per-document hashed-bigram importance weights of `pool` against
    * `target`: `(idCol, strataCol, n_grams, lw_micros)` where `lw_micros`
    * is the integer micro-nat sum of per-gram log ratios (positive =
    * more target-like). `target` may overlap `pool` (DSIR scores the
    * whole crawl, curated rows included). */
  def importanceWeights(
      pool: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      strataCol: String,
      buckets: Int = 4096
  ): DataFrame = {
    val b = buckets
    val poolGrams = bucketStream(pool, textCol, idCol, strataCol, b)
      .localCheckpoint(true) // two consumers: raw counts and the scoring join
    val raw = poolGrams.groupBy("b").agg(count(lit(1)).as("cr"))
    val tgt = bucketStream(target, textCol, idCol, strataCol, b)
      .groupBy("b").agg(count(lit(1)).as("ct"))
    // four bounded driver scalars (≤ buckets-row aggregates), incl. the
    // overflow/exactness guard bounds
    val rr = raw.agg(coalesce(sum(col("cr")), lit(0L)),
      coalesce(max(col("cr")), lit(0L))).head()
    val tr = tgt.agg(coalesce(sum(col("ct")), lit(0L)),
      coalesce(max(col("ct")), lit(0L))).head()
    val (nr, maxCr) = (rr.getLong(0), rr.getLong(1))
    val (nt, maxCt) = (tr.getLong(0), tr.getLong(1))
    require((maxCt + 1).toDouble * (nr + b) < 9007199254740992.0 && // 2^53
            (maxCr + 1).toDouble * (nt + b) < 9007199254740992.0,
      s"Dsir ratio form needs (max_count+1)*(N+B) < 2^53 for exact double " +
        s"conversion (got maxCt=$maxCt, nr=$nr, maxCr=$maxCr, nt=$nt, B=$b); " +
        "pre-divide the ratio or shard the corpus before calling")
    val term = log(
      ((coalesce(col("ct"), lit(0L)) + 1L) * lit(nr + b)).cast("double") /
        ((col("cr") + 1L) * lit(nt + b)).cast("double"))
    poolGrams
      .join(broadcast(raw), "b")            // every pool gram has cr ≥ 1
      .join(broadcast(tgt), Seq("b"), "left") // absent bucket → ct = 0
      .withColumn("__m", floor(term * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col("id").as(idCol), col("stratum").as(strataCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("__m")).as("lw_micros"))
  }

  /** Importance-resample: keep the top `ceil(n · keepNum / keepDen)`
    * documents of each stratum by descending weight (id tiebreak), as a
    * `selected` flag on the [[importanceWeights]] output. Integer-exact:
    * `selected ⇔ n·keepNum > (rank−1)·keepDen`. */
  def dsirSelect(
      pool: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      strataCol: String,
      buckets: Int = 4096,
      keepNum: Int = 1,
      keepDen: Int = 5
  ): DataFrame = {
    require(keepNum > 0 && keepDen > 0, "keep fraction must be positive")
    val weights = importanceWeights(pool, target, textCol, idCol, strataCol, buckets)
    val w = Window.partitionBy(strataCol)
      .orderBy(col("lw_micros").desc, col(idCol).asc)
    val cw = Window.partitionBy(strataCol)
    weights
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .withColumn("selected", col("__n") * keepNum > (col("__r") - 1) * keepDen)
      .drop("__r", "__n")
  }
}
