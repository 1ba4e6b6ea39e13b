package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment a
  * training pipeline must be able to REPRODUCE forever. `randomSplit`'s
  * assignment depends on partition layout and sampling order; here every
  * row's split follows from its key content alone: bucket =
  * int(md5(key ++ salt)[0,8)) mod 10000, and fractions own contiguous
  * bucket ranges. Stable across runs, repartitionings, engines, and
  * cluster layouts.
  *
  * md5 on purpose (not xxhash64): every engine speaks it, so membership
  * can be recomputed outside Spark byte-for-byte (the q47 oracle does
  * exactly that in DuckDB). Changing `salt` re-rolls the whole split;
  * keeping it pins the split for the lifetime of the dataset.
  */
object Sampling {

  /** Bucket granularity: fractions resolve to 1/10000ths. */
  val Buckets: Int = 10000

  /** The md5 hex digest of (key ++ salt) — the ONE content-keying
    * expression every deterministic selection here derives from
    * ([[bucket]]'s ranges, [[stratifiedSample]]'s ordering), so the
    * keying (delimiting, casting, null policy) can never drift between
    * them or their oracles. */
  private def keyDigest(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(salt)))

  /** The stable bucket in [0, Buckets) for a key. First 8 md5 hex chars →
    * 32-bit int (fits a long far from overflow) → mod. A NULL key fails
    * LOUDLY: md5(null) is null and every range test would silently fall
    * through to the last split — a train/test leak shaped exactly like
    * the bug this utility exists to prevent. */
  def bucket(key: Column, salt: String = ""): Column = {
    val b = pmod(conv(substring(keyDigest(key, salt), 1, 8), 16, 10)
      .cast("long"), lit(Buckets.toLong))
    when(key.isNull,
      raise_error(lit("Sampling: split key must be non-null"))).otherwise(b)
  }

  /** Append `splitCol` (0-based split index) without materializing
    * anything: a pure projection, usable in batch and streaming alike.
    * `fractions` must sum to 1 (±1 bucket of rounding). */
  def withSplitId(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[Double],
      salt: String = "",
      splitCol: String = "split_id"
  ): DataFrame = {
    val thresholds = cumulativeThresholds(fractions)
    val b = bucket(col(keyCol), salt)
    val expr = thresholds.init.zipWithIndex.reverse.foldLeft(
      lit(fractions.size - 1)) { case (acc, (thr, i)) =>
      when(b < thr, lit(i)).otherwise(acc)
    }
    df.withColumn(splitCol, expr)
  }

  /** Materialized variant: one DataFrame per fraction, disjoint and
    * jointly exhaustive over the input. */
  def hashSplit(
      df: DataFrame,
      keyCol: String,
      fractions: Seq[Double],
      salt: String = ""
  ): Seq[DataFrame] = {
    val tagged = withSplitId(df, keyCol, fractions, salt)
    fractions.indices.map(i => tagged.filter(col("split_id") === i).drop("split_id"))
  }

  private def cumulativeThresholds(fractions: Seq[Double]): Seq[Int] = {
    require(fractions.nonEmpty && fractions.forall(_ > 0), s"bad fractions $fractions")
    val thr = fractions.scanLeft(0.0)(_ + _).tail.map(f => math.round(f * Buckets).toInt)
    require(math.abs(thr.last - Buckets) <= 1,
      s"fractions must sum to 1, got ${fractions.sum}")
    thr.init :+ Buckets // absorb rounding into the last split
  }

  /** STRATIFIED sampling: exactly ceil(frac · |stratum|) rows from every
    * stratum, chosen deterministically — rows sort within their stratum
    * by the md5 hex digest of (key ++ salt) (a content-derived shuffle
    * order both Spark and any SQL engine reproduce byte-for-byte as a
    * plain string sort) and the first k are kept. Exactness per stratum
    * is what distinguishes this from `df.sampleBy` (probabilistic counts,
    * partition-layout dependent) — a per-source eval slice or a balanced
    * annotation batch needs the counts to be right, not approximately
    * right.
    *
    * Scale shape: ONE window per stratum (rank + count over the same
    * partitioning = one shuffle), parallelism = stratum count, bounded by
    * the largest stratum. For strata too large to window, the
    * APPROXIMATE no-shuffle form is `bucket(key, salt) < frac · Buckets`
    * (a pure filter reusing [[bucket]]) — same determinism, binomial
    * count jitter; this exact form is the default because sample QUOTAS
    * are usually small and strata numerous. */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      frac: Double,
      salt: String = "",
      rankCol: String = "sample_rank"
  ): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac must be in (0, 1], got $frac")
    // NULL keys fail loudly (same policy and reason as [[bucket]]): a
    // null digest sorts FIRST in Spark but LAST in most SQL engines, so
    // null-key rows would silently crowd the quota here while an external
    // recomputation selects different members — the portability break
    // this operator exists to prevent.
    val order = when(col(keyCol).isNull,
      raise_error(lit("Sampling: stratified sample key must be non-null")))
      .otherwise(keyDigest(col(keyCol), salt))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(order.asc, col(keyCol).asc)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    df.withColumn(rankCol, row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col(rankCol) <= ceil(col("__n") * frac))
      .drop("__n")
  }

  /** DATA-MIXTURE selection: pick documents so each stratum contributes
    * tokens in a TARGET RATIO (the pretraining "data mixing" step —
    * upweight curated sources, downweight bulk crawl — here by exact
    * greedy selection rather than sampling probabilities). The common
    * budget `B = min_s floor(total_s / w_s)` is the largest scale every
    * stratum can serve; stratum `s` then keeps its documents in the
    * deterministic md5 content order (same portable ordering as
    * [[stratifiedSample]]) while cumulative size stays ≤ `w_s · B`.
    *
    * Everything is integer arithmetic over one scan: per-stratum totals
    * (map-side combined), ONE driver-side scalar (the stratum-count-sized
    * budget row — bounded, not data-sized), and one window per stratum
    * for the cumulative sum. Returns the kept rows with `mix_quota` (the
    * stratum's token budget) and `cum_size` attached. */
  def mixtureSelect(
      df: DataFrame,
      sizeCol: String,
      idCol: String,
      strataCol: String,
      weightOf: Column,
      salt: String = ""
  ): DataFrame = {
    val rows = df.select(col(strataCol), col(idCol), col(sizeCol).cast("long").as("__sz"),
        weightOf.cast("long").as("__w"))
      .localCheckpoint(true) // two consumers: totals and the windowed cumsum
    val budget = rows.groupBy(col(strataCol), col("__w"))
      .agg(sum(col("__sz")).as("__total"))
      .agg(min(floor(col("__total") / col("__w")).cast("long")).as("b"))
      .head().getLong(0)
    val order = when(col(idCol).isNull,
      raise_error(lit("Sampling: mixture key must be non-null")))
      .otherwise(keyDigest(col(idCol), salt))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(order.asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    rows
      .withColumn("cum_size", sum(col("__sz")).over(w))
      .withColumn("mix_quota", col("__w") * budget)
      .filter(col("cum_size") <= col("mix_quota"))
      .select(col(strataCol), col(idCol), col("__sz").as(sizeCol),
        col("cum_size"), col("mix_quota"))
  }

  /** Document CHUNKING: split each document's token stream into
    * fixed-`size` windows advancing by `stride` tokens (overlap =
    * size − stride), the shaping step that turns long documents into
    * training-window rows. Chunk k covers tokens
    * [k·stride, k·stride + size); the final chunk may be shorter; a doc
    * with ≤ `size` tokens yields exactly one chunk; token-less docs are
    * dropped. Pure per-row projection + explode — no shuffle, no state,
    * trivially streamable; emitted columns are the chunk's token count
    * and boundary tokens (integers/strings, so the assignment is
    * engine-recomputable — the q63 oracle replays it in SQL).
    *
    * Row-size note at scale: emitting chunk TEXT would multiply payload
    * by the overlap factor; this emits coordinates + boundaries so the
    * (doc_id, chunk_id) → token-span mapping can be joined/applied
    * lazily where the text is actually consumed. */
  /** Chunk count for a document of `n` tokens under (`size`, `stride`):
    * the ONE formula [[chunkDocuments]] explodes — exposed so aggregate
    * chunk ACCOUNTING (total chunks/tokens without materializing chunks,
    * q64-style) can never drift from the operator's window policy. */
  /** TEMPERATURE-SCALED MIXTURE design (the multilingual/multi-source
    * LLM practice of sampling source s proportional to n_s^alpha,
    * alpha < 1 flattening the head so low-resource sources are not
    * drowned — alpha = 1 is natural proportion, alpha → 0 uniform):
    * per stratum, the unit total, the micro-quantized weight
    * `floor(exp(alpha·ln(n))·1e6 + 0.5)` (the exp∘ln form written
    * identically in the oracle; quantization absorbs the couple-ulp
    * cross-engine spread, q70 boundary caveat applies), and the integer
    * per-myriad share each source gets of the training mix — the table a
    * mixture-weighted sampler ([[mixtureSelect]]) is then driven by.
    *
    * Scale shape: one aggregation to per-stratum totals (map-side
    * combined), then arithmetic over the strata-sized table with one
    * broadcast total — no second pass over the data. Strata with zero
    * units are excluded (ln(0) guards differ across engines; a zero-unit
    * source has no sampleable mass anyway). */
  def temperatureMixture(
      df: DataFrame,
      sizeCol: String,
      strataCol: String,
      alpha: Double
  ): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    val sizes = df.groupBy(col(strataCol).as("stratum"))
      .agg(sum(col(sizeCol)).as("n_units"))
      .filter(col("n_units") >= 1L)
    val weighted = sizes.withColumn("weight_micros",
      floor(exp(lit(alpha) * log(col("n_units").cast("double"))) * 1e6 + 0.5)
        .cast("long"))
    val total = weighted.agg(sum(col("weight_micros")).cast("long").as("__tw"))
    weighted.crossJoin(total)
      .withColumn("share_pmyriad", expr("weight_micros * 10000 DIV __tw"))
      .select("stratum", "n_units", "weight_micros", "share_pmyriad")
  }

  /** WEIGHTED sampling without replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): keep the
    * `perStratum` rows of each stratum with the largest priority
    * `ln(u)/w` (monotone in the paper's `u^(1/w)`), where u is a
    * DETERMINISTIC uniform draw from the key — heavier rows win more
    * often, every row has positive probability, and membership is
    * replayable. The draw is exact cross-engine by construction:
    * `u = ((md5_64(key·salt) >>> 11) + 1) · 2⁻⁵³ ∈ (0, 1]` — a 53-bit
    * integer scaled by a power of two, both lossless in IEEE double.
    * `ln`'s ≤1-ulp engine spread is absorbed by micro-quantization
    * (`floor(ln(u)/w·1e6 + 0.5)`, the q70 construction and caveat);
    * id tiebreak makes the rank total.
    *
    * Scale shape: priority is a pure projection; selection is the same
    * per-stratum window as [[stratifiedSample]] (no global sort). The
    * at-scale swap for global top-k is a per-partition heap + merge —
    * same priorities, no window. Weights must be ≥ 1 (filter or clamp
    * upstream; w ≤ 0 would invert the order). */
  /** The Efraimidis-Spirakis priority of (key, weight) — ONE definition
    * shared by the window path and the aggregate path, so the two
    * physical strategies can never disagree on membership. */
  private def esPriority(keyCol: String, weightCol: String, salt: String) = {
    val h = graft.plans.SketchFunctions.portableHash64(
      array(concat(col(keyCol).cast("string"), lit(salt))))
    val u = (shiftrightunsigned(element_at(h, 1), 11) + 1L).cast("double") *
      lit(1.1102230246251565e-16) // 2^-53
    val guarded = when(col(keyCol).isNull,
      raise_error(lit("Sampling: weighted sample key must be non-null")))
      .otherwise(u)
    floor(log(guarded) / col(weightCol).cast("double") * 1e6 + 0.5).cast("long")
  }

  def weightedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      weightCol: String,
      perStratum: Int,
      salt: String = "ws1"
  ): DataFrame = {
    require(perStratum > 0, "perStratum must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("__prio").desc, col(keyCol).asc)
    df.filter(col(weightCol) >= 1)
      .withColumn("__prio", esPriority(keyCol, weightCol, salt))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perStratum)
      .withColumnRenamed("__prio", "priority_micros")
  }

  /** [[weightedSample]]'s documented at-scale swap, IMPLEMENTED: the
    * same priorities selected by a bounded-state top-k aggregate
    * ([[graft.plans.TopKByPriority]]) instead of a per-stratum window —
    * map-side partial aggregation reduces every partition to ≤
    * perStratum pairs before the shuffle, no per-stratum sort exists
    * anywhere, and the identical aggregation runs under Structured
    * Streaming complete mode (the streaming weighted reservoir —
    * StreamingSpec). Output contract is [[weightedSample]]'s minus the
    * carried payload columns: `(strataCol, keyCol, priority_micros,
    * sample_rank)` — membership and ranks provably identical
    * (SamplingSpec asserts equality; keys must be integral here, the
    * price of 16-byte aggregate state). */
  def weightedSampleAgg(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      weightCol: String,
      perStratum: Int,
      salt: String = "ws1"
  ): DataFrame = {
    require(perStratum > 0, "perStratum must be positive")
    df.filter(col(weightCol) >= 1)
      .withColumn("__prio", esPriority(keyCol, weightCol, salt))
      .groupBy(col(strataCol))
      .agg(graft.plans.TopKByPriority.topK(
        col("__prio"), col(keyCol).cast("long"), perStratum).as("__top"))
      .select(col(strataCol), posexplode(col("__top")))
      .select(col(strataCol), col("col.id").as(keyCol),
        col("col.priority").as("priority_micros"),
        (col("pos") + 1).cast("int").as("sample_rank"))
  }

  def chunkCount(n: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    when(n <= size, lit(1L)).otherwise(
      lit(1L) + ceil((n - lit(size)).cast("double") / stride).cast("long"))
  }

  def chunkDocuments(
      df: DataFrame,
      textCol: String,
      idCol: String,
      size: Int,
      stride: Int
  ): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    // tokenize ONCE: the token array is projected alone first and every
    // later step references the alias. Token-less docs are dropped by
    // EXPLODING an empty chunk list rather than a filter — a
    // `filter(n_doc > 0)` gets pushed below this projection and
    // substituted back to `size(tokens(text)) > 0`, re-running the
    // interpreted tokenizer per document (the repeated-scan cost this
    // codebase keeps eliminating); explode-of-empty cannot be pushed.
    df.select(col(idCol), graft.functions.TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        org.apache.spark.sql.functions.size(col("__t")).as("n_doc"))
      .withColumn("n_chunks", chunkCount(col("n_doc"), size, stride))
      .withColumn("chunk_id", explode(
        when(col("n_doc") > 0, sequence(lit(0L), col("n_chunks") - 1))
          .otherwise(array().cast("array<bigint>"))))
      .select(col(idCol), col("chunk_id"), col("n_doc"),
        least(lit(size.toLong), col("n_doc") - col("chunk_id") * stride).as("n_tokens_chunk"),
        element_at(col("__t"), (col("chunk_id") * stride + 1).cast("int")).as("first_token"),
        element_at(col("__t"),
          least(col("chunk_id") * stride + size, col("n_doc")).cast("int")).as("last_token"))
  }

  /** Sequence PACKING: assign each row to a fixed-budget bin (a training
    * context window) by offset quantization — a row starts in the bin
    * where its cumulative-size start offset lands (`floor(cum_before /
    * budget)`). Deterministic given (partition key, order key); a bin may
    * overrun by at most one row's tail, the standard streaming-packing
    * trade (cap long rows upstream if hard budgets are needed).
    *
    * Scale shape: ONE window partitioned by `partitionCols` — per-group
    * cumulative sums, never a global total order. An unpartitioned call
    * would funnel everything through one task, so partition columns are
    * required; a training corpus always has a natural one (source, shard,
    * date).
    */
  def packBins(
      df: DataFrame,
      sizeCol: String,
      orderCol: String,
      partitionCols: Seq[String],
      budget: Long,
      binCol: String = "bin_id"
  ): DataFrame = {
    require(partitionCols.nonEmpty,
      "packBins needs partition columns — a global pack is a single-task bottleneck")
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(col(sizeCol).cast("long")).over(w), lit(0L))
    df.withColumn(binCol, floor(cumBefore / budget))
  }

  /** QUOTA SAMPLING to a TARGET MIX — the matched-sampling primitive a
    * training-data pipeline uses to hit a prescribed distribution
    * ("40% web, 30% books, ..."): per category, take the `quota_k`
    * rows with the smallest salted md5 rank, where
    *
    *     scale   = min_k (available_k · 10⁴ DIV target_k)   (feasibility)
    *     quota_k = scale · target_k DIV 10⁴
    *
    * — the LARGEST sample whose composition matches the permyriad
    * targets without exceeding any category's supply. Hash-ranked
    * selection makes membership a pure function of row content (the
    * [[bucket]] determinism argument: reproducible across runs,
    * partitionings, and engines — unlike `sample()`), and the rank
    * window partitions BY CATEGORY, never globally.
    *
    * @param targets (category, permyriad) — must sum to 10000; rows of
    *                uncovered categories are dropped
    * @return the sampled subset of `df`'s rows, original columns
    */
  def quotaSample(df: DataFrame, typeCol: String, keyCol: String,
                  targets: Seq[(String, Long)], salt: String): DataFrame = {
    require(targets.nonEmpty && targets.map(_._2).sum == 10000L,
      "targets must sum to 10000 permyriad")
    require(targets.forall(_._2 > 0), "each target must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val t = targets.toDF("_t", "_share")
    val base = df.join(broadcast(t), col(typeCol) === col("_t"))
      .localCheckpoint(true) // availability census + the ranked pick
    val avail = base.groupBy(col(typeCol).as("_ty"), col("_share"))
      .agg(count(lit(1)).as("_avail"))
    // the feasibility scale is a 1-row scalar crossJoin (q84 pattern)
    val quotas = avail
      .crossJoin(avail.agg(
        min(expr("_avail * 10000 DIV _share")).as("_scale")))
      .select(col("_ty"), expr("_scale * _share DIV 10000").as("_quota"))
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))).asc,
        col(keyCol).asc)
    base.withColumn("_rk", row_number().over(byType))
      .join(broadcast(quotas), col(typeCol) === col("_ty"))
      .filter(col("_rk") <= col("_quota"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
