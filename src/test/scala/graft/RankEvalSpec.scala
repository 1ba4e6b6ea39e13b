package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RankEval

class RankEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = RankEval.DiscountMicro
  private val C = RankEval.CumMicro

  /** One query (id 100, label 1), items with labels, corpus n_rel. */
  private def eval(retrieved: Seq[(Long, Long, Int)], // (item, rank) with label
      nRel: Long, k: Int = 5, selfItem: Long = -1L) = {
    val r = retrieved.map { case (item, rank, _) => (100L, item, rank) }
      .toDF("query_id", "item_id", "rank")
    val items = retrieved.map { case (item, _, lab) => (item, lab) }
      .toDF("item_id", "label")
    val queries = Seq((100L, 1)).toDF("query_id", "label")
    val corpus = Seq((1, nRel)).toDF("label", "n_rel")
    RankEval.metricsAtK(r, "query_id", "item_id", "rank",
        queries, items, corpus, k,
        excludeSelf = col("item_id") === selfItem)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).head
  }

  test("perfect retrieval: all three metrics at 10000") {
    val got = eval((1L to 5L).map(i => (i, i, 1)), nRel = 50L)
    assert(got == ((10000L, 10000L, 10000L)))
  }

  test("a single hit at rank 3: every metric hand-checked") {
    val got = eval(Seq((1L, 1L, 0), (2L, 2L, 0), (3L, 3L, 1),
      (4L, 4L, 0), (5L, 5L, 0)), nRel = 50L)
    assert(got._1 == 2000L)                       // 1/5
    assert(got._2 == W(2) * 10000L / C(4))        // w3 / cum5
    assert(got._3 == 10000L / 3L)                 // 1/3 truncated
  }

  test("self-exclusion re-ranks densely: the hit moves up to position 1") {
    val got = eval(Seq((9L, 1L, 1), (3L, 2L, 1), (4L, 3L, 0)),
      nRel = 50L, selfItem = 9L)
    assert(got._3 == 10000L)                      // first relevant at er=1
    assert(got._1 == 2000L)                       // still 1 hit of k=5
  }

  test("IDCG is bounded by the corpus: full recall of 2 relevant scores NDCG 1") {
    val got = eval(Seq((1L, 1L, 1), (2L, 2L, 1), (3L, 3L, 0),
      (4L, 4L, 0), (5L, 5L, 0)), nRel = 2L)
    assert(got._2 == 10000L)                      // dcg = idcg = cum2
    assert(got._1 == 4000L)
  }

  test("no relevant items in the corpus: NDCG and MRR report 0, not errors") {
    val got = eval(Seq((1L, 1L, 0), (2L, 2L, 0)), nRel = 0L)
    assert(got == ((0L, 0L, 0L)))
  }

  test("a query with zero surviving candidates scores 0 and still counts") {
    import graft.operators.RankEval
    // query 100 retrieves one perfect item; query 200 retrieves ONLY its
    // excluded self-copy -> no candidates survive, yet it must count
    val r = Seq((100L, 1L, 1L), (200L, 9L, 1L)).toDF("query_id", "item_id", "rank")
    val items = Seq((1L, 1), (9L, 1)).toDF("item_id", "label")
    val queries = Seq((100L, 1), (200L, 1)).toDF("query_id", "label")
    val corpus = Seq((1, 10L)).toDF("label", "n_rel")
    val Array(row) = RankEval.metricsAtK(r, "query_id", "item_id", "rank",
      queries, items, corpus, k = 5,
      excludeSelf = col("item_id") === lit(9L)).collect()
    assert(row.getAs[Long]("n_queries") == 2L, "the empty query counts")
    // query 100: p=2000, mrr=10000; query 200: all zeros -> means halve
    assert(row.getAs[Long]("p_at_k_pm") == 1000L)
    assert(row.getAs[Long]("mrr_pm") == 5000L)
  }
}
