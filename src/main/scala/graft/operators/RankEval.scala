package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RANKING-QUALITY METRICS for a retrieval system: Precision@k, NDCG@k,
  * and (truncated-reciprocal) MRR over a ranked candidate list against
  * binary label relevance — the offline eval harness that belongs next
  * to every ANN/recommendation operator (q28/q29/q44/q121): retrieval
  * without a scored eval is a demo, not a system.
  *
  * Exactness: relevance is 0/1, and the log₂ position discounts are a
  * PINNED micro-unit table (w_i = round(10⁶/log₂(i+1)), i ≤ 20) — so
  * DCG is an exact integer sum, IDCG is a prefix-sum lookup at
  * min(R, k) (R = relevant items available in the corpus for that
  * query's label), and every reported ratio is truncating per-myriad
  * division. MRR's per-query term is ⌊10⁴/first_rel_rank⌋ — truncated
  * BEFORE averaging, documented (exactness beats the last decimal of
  * an aggregate diagnostic).
  *
  * Scale shape: self-exclusion + re-rank is a window partitioned by
  * query (bounded by retrieval depth, NOT data-sized); label joins are
  * keyed shuffles; metrics are two map-side-combined aggregates
  * (per-query, then per-label). The discount table rides the plan as a
  * literal array.
  */
object RankEval {

  /** round(10⁶ / log₂(i+1)) for ranks 1..20 — the canonical NDCG
    * discounts, pinned so both engines share one table. */
  val DiscountMicro: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L, 356207L, 333333L,
    315465L, 301030L, 289065L, 278943L, 270238L, 262650L, 255958L,
    250000L, 244651L, 239812L, 235409L, 231378L, 227670L)

  /** Prefix sums of [[DiscountMicro]]: IDCG at depth d is CumMicro(d). */
  val CumMicro: Seq[Long] = DiscountMicro.scanLeft(0L)(_ + _).tail

  /** @param retrieved  (queryCol, itemCol, rankCol) — ranked candidates,
    *                   rank 1-based in retrieval order
    * @param queryRel   (queryCol, label) — each query's label
    * @param itemRel    (itemCol, label) — each item's label
    * @param corpusRel  (label, n_rel) — how many relevant items the
    *                   corpus holds for that label (the recall/IDCG
    *                   denominator — caller decides self-exclusion)
    * @param k          evaluation depth (≤ 20, the pinned table)
    * @param excludeSelf rows to DROP before evaluation (e.g. the
    *                   query's own copy); remaining candidates re-rank
    *                   densely so position discounts stay honest
    * @return per label: n_queries, p_at_k_pm, ndcg_at_k_pm, mrr_pm —
    *         EVERY query in `queryRel` counts: one with no surviving
    *         candidates scores 0 on all three metrics (standard IR
    *         accounting; dropping it would hide retrieval failures) */
  def metricsAtK(
      retrieved: DataFrame,
      queryCol: String,
      itemCol: String,
      rankCol: String,
      queryRel: DataFrame,
      itemRel: DataFrame,
      corpusRel: DataFrame,
      k: Int,
      excludeSelf: Column
  ): DataFrame = {
    require(k >= 1 && k <= DiscountMicro.size, s"k=$k outside the pinned table")
    val w = Window.partitionBy(col(queryCol)).orderBy(col(rankCol).asc)
    val ev = retrieved.filter(!excludeSelf)
      .withColumn("_er", row_number().over(w))
      .filter(col("_er") <= k)
      .join(itemRel.withColumnRenamed("label", "_il"), itemCol)
      .join(queryRel.withColumnRenamed("label", "_ql"), queryCol)
      .withColumn("_rel", (col("_il") === col("_ql")).cast("long"))
    val wArr = typedlit(DiscountMicro)
    val cumArr = typedlit(CumMicro)
    val perQuery = ev.groupBy(col(queryCol))
      .agg(
        sum(col("_rel")).as("_hits"),
        sum(col("_rel") * element_at(wArr, col("_er").cast("int"))).as("_dcg"),
        min(when(col("_rel") === 1L, col("_er"))).as("_first"))
    // EVERY query counts: one that retrieved nothing (empty probe
    // buckets, or only its excluded self-copy) scores 0 on all three
    // metrics — silently dropping it would let a retriever that fails
    // 30% of queries score like one that answers them all
    val spine = queryRel.withColumnRenamed("label", "_ql")
      .join(perQuery, Seq(queryCol), "left")
      .withColumn("_hits", coalesce(col("_hits"), lit(0L)))
      .withColumn("_dcg", coalesce(col("_dcg"), lit(0L)))
      .join(corpusRel.withColumnRenamed("label", "_ql"), "_ql")
      .withColumn("_idcg",
        when(col("n_rel") >= 1L,
          element_at(cumArr, least(col("n_rel"), lit(k.toLong)).cast("int")))
          .otherwise(0L))
    val scored = spine
      .select(col("_ql").as("label"),
        expr(s"_hits * 10000 DIV $k").as("_p"),
        when(col("_idcg") > 0, expr("_dcg * 10000 DIV _idcg"))
          .otherwise(0L).as("_ndcg"),
        coalesce(expr("10000 DIV _first"), lit(0L)).as("_rr"))
    scored.groupBy(col("label"))
      .agg(count(lit(1)).as("n_queries"),
        expr("sum(_p) DIV count(1)").as("p_at_k_pm"),
        expr("sum(_ndcg) DIV count(1)").as("ndcg_at_k_pm"),
        expr("sum(_rr) DIV count(1)").as("mrr_pm"))
      .orderBy(col("label"))
  }
}
