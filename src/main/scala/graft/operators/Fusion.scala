package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RANK FUSION — merge independently-produced rankings of one id space
  * into a single list. The canonical use is HYBRID SEARCH: a lexical
  * ranker (BM25, [[Bm25]]) and a vector ranker (cosine ANN,
  * [[Similarity]]) each retrieve their own top-k over the same corpus;
  * reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR'09) combines
  * them using ONLY the ranks — no score normalization across
  * incomparable scales (BM25 micros vs cosine doubles) is needed, which
  * is exactly why RRF is the industry default for first-stage hybrid
  * retrieval.
  *
  *     rrf(id) = Σ_lists 10⁶ DIV (k0 + rank_list(id))
  *
  * with the conventional k0 = 60 damping ties to any single ranker.
  * Each term is one truncating integer DIV (already in micro units), so
  * the fused score is exact and engine-independent — no floats.
  *
  * Scale shape: inputs are each ranker's top-k frame (k rows — the
  * rankers themselves already did the heavy retrieval with their own
  * scale paths: TakeOrdered for BM25, bucketed ANN for vectors). Fusion
  * is a union + one groupBy on id over ≤ Σk rows. Fusing FULL corpus
  * rankings instead degrades gracefully to one id-keyed shuffle.
  */
object Fusion {

  /** Reciprocal-rank-fuse named rank lists.
    *
    * @param lists  (name, frame) pairs; each frame has `idCol` and
    *               `rankCol` (1-based dense ranks). Names become output
    *               columns `rank_<name>` (NULL where the id was absent —
    *               absence contributes 0, the RRF convention).
    * @param k0     damping constant (60 per the original paper)
    * @param topK   fused rows to keep
    * @return id, rank_<name>…, rrf_micro, fused_rank — ordered by
    *         (rrf_micro desc, id asc), ties in the score broken by id
    */
  def reciprocalRank(lists: Seq[(String, DataFrame)], idCol: String,
      rankCol: String, k0: Long = 60L, topK: Int = 10): DataFrame = {
    require(lists.size >= 2, "fusion needs at least two rank lists")
    val tagged = lists.map { case (name, df) =>
      df.select(col(idCol).cast("long").as("id"),
        lit(name).as("src"), col(rankCol).cast("long").as("rnk"))
    }.reduce(_ unionByName _)
    val wide = tagged.groupBy(col("id"))
      .pivot("src", lists.map(_._1)) // literal name list — no extra pass
      .agg(first(col("rnk")))
    val contributions = lists.map { case (name, _) =>
      coalesce(expr(s"1000000 DIV (${k0} + `${name}`)"), lit(0L))
    }.reduce(_ + _)
    val ranked = wide
      .withColumn("rrf_micro", contributions)
      .orderBy(col("rrf_micro").desc, col("id").asc)
      .limit(topK)
    // window sees topK rows only (post-TakeOrdered, the q77 discipline)
    val w = Window.orderBy(col("rrf_micro").desc, col("id").asc)
    ranked.withColumn("fused_rank", row_number().over(w))
      .select(Seq(col("id")) ++
        lists.map { case (n, _) => col(s"`${n}`").as(s"rank_${n}") } ++
        Seq(col("rrf_micro"), col("fused_rank")): _*)
      .orderBy("fused_rank")
  }

  /** MAXIMAL MARGINAL RELEVANCE re-rank (Carbonell & Goldstein '98) —
    * the diversity pass a retrieval stack runs AFTER fusion: greedily
    * pick the candidate maximizing
    *
    *     mmr = (λ·rel_norm − (1−λ)·max_sim_to_selected) DIV 100
    *
    * so near-duplicates of already-chosen results are pushed down even
    * when their raw relevance is high. Everything is integer micro
    * units: relevance is normalized to the candidate max by one
    * truncating DIV, similarity is the IEEE cosine floored to micros
    * (both engines floor the same double), and the λ blend is one more
    * truncating DIV — the greedy trace is bit-replayable.
    *
    * Scale shape: candidates are a FUSED TOP-K frame (topK-bounded by
    * construction, enforced by `maxCandidates`), so the pairwise
    * cosine self-join is ≤ maxCandidates² rows and the greedy loop
    * runs driver-side over collected longs — the pinned-centroid
    * bounded-collect discipline, NOT a data-sized collect. The heavy
    * retrieval stays in the rankers.
    *
    * @param candidates (idCol, relCol) — the fused list (e.g. q217)
    * @param embFrame   (embIdCol, embCol) — vectors for every candidate
    * @param lambdaPct  λ·100 (70 = the conventional 0.7)
    * @return doc_id, mmr_rank (1..k), rel_norm_micro, max_sim_micro
    *         (at selection time), mmr_micro — selection order
    */
  def mmrRerank(candidates: DataFrame, idCol: String, relCol: String,
      embFrame: DataFrame, embIdCol: String, embCol: String,
      lambdaPct: Int = 70, k: Int = 10, maxCandidates: Int = 256): DataFrame = {
    require(lambdaPct >= 0 && lambdaPct <= 100, "lambdaPct in [0,100]")
    val spark = candidates.sparkSession
    val rels = candidates
      .select(col(idCol).cast("long"), col(relCol).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    require(rels.nonEmpty && rels.length <= maxCandidates,
      s"mmrRerank expects a bounded fused top-k, got ${rels.length}")
    val maxRel = rels.map(_._2).max
    require(maxRel > 0, "relevance scores must be positive")
    val relNorm = rels.map { case (id, r) => id -> 1000000L * r / maxRel }.toMap
    val ids = rels.map(_._1)
    val embs = embFrame
      .filter(col(embIdCol).isin(ids: _*))
      .select(col(embIdCol).cast("long").as("id"), col(embCol).as("e"))
      .localCheckpoint(true) // tiny: one row per candidate
    require(embs.count() == ids.length.toLong,
      "every candidate needs exactly one embedding")
    val simRows = embs.select(col("id").as("ia"), col("e").as("ea"))
      .join(embs.select(col("id").as("ib"), col("e").as("eb")),
        col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"),
        floor(Similarity.cosine(col("ea"), col("eb")) * lit(1000000d))
          .cast("long").as("s"))
      .collect()
    val sim = simRows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    var selected = Vector.empty[(Long, Long, Long, Long)]
    var remaining = ids.sorted.toVector
    while (selected.size < math.min(k, ids.length) && remaining.nonEmpty) {
      val scored = remaining.map { id =>
        val ms = if (selected.isEmpty) 0L
          else selected.map(s => sim((id, s._1))).max
        val mmr = (lambdaPct * relNorm(id) - (100L - lambdaPct) * ms) / 100L
        (id, relNorm(id), ms, mmr)
      }
      val best = scored.maxBy { case (id, _, _, mmr) => (mmr, -id) }
      selected :+= best
      remaining = remaining.filterNot(_ == best._1)
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case ((id, rn, ms, mmr), i) => (id, i + 1, rn, ms, mmr) }
      .toDF("doc_id", "mmr_rank", "rel_norm_micro", "max_sim_micro",
        "mmr_micro")
  }
}
