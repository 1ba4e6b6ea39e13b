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
}
