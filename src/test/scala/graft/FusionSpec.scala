package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fusion

class FusionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rrf: hand-computed fusion of two overlapping lists") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Fusion.reciprocalRank(Seq("a" -> a, "b" -> b), "id", "rank",
        k0 = 60L, topK = 10)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("rrf_micro"), r.getAs[Int]("fused_rank"))).toMap
    // 20 is in both lists: 10^6/62 + 10^6/61 = 16129 + 16393
    assert(out(20L) == (16129L + 16393L, 1))
    // 10 and 40: single-list, 10^6/61 and 10^6/62
    assert(out(10L) == (16393L, 2))
    assert(out(40L) == (16129L, 3))
    assert(out(30L) == (15873L, 4))
  }

  test("rrf: equal scores break ties by id ascending") {
    val a = Seq((7L, 1), (3L, 2)).toDF("id", "rank")
    val b = Seq((3L, 1), (7L, 2)).toDF("id", "rank")
    val out = Fusion.reciprocalRank(Seq("a" -> a, "b" -> b), "id", "rank")
      .collect()
    // both ids score 10^6/61 + 10^6/62 — id 3 must rank first
    assert(out.map(_.getAs[Long]("id")).toList == List(3L, 7L))
    assert(out.map(_.getAs[Long]("rrf_micro")).distinct.length == 1)
  }

  test("rrf: topK truncates after fusion, not per list") {
    val a = (1L to 5L).map(i => (i, i.toInt)).toDF("id", "rank")
    val b = (6L to 9L).map(i => (i, (i - 5).toInt)).toDF("id", "rank")
    val out = Fusion.reciprocalRank(Seq("a" -> a, "b" -> b), "id", "rank",
      topK = 3).collect()
    assert(out.length == 3)
    // rank-1 entries of each list lead; id tie-break puts 1 before 6
    assert(out.map(_.getAs[Long]("id")).toList == List(1L, 6L, 2L))
  }

  test("mmr: a near-duplicate of the top pick sinks below a diverse candidate") {
    // 1 and 2 are identical vectors (cos 1), 3 is orthogonal; pure
    // relevance would order 1,2,3 — MMR at lambda .7 orders 1,3,2
    val cand = Seq((1L, 100L), (2L, 99L), (3L, 80L)).toDF("id", "rel")
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f))).toDF("vid", "e")
    val out = Fusion.mmrRerank(cand, "id", "rel", emb, "vid", "e",
      lambdaPct = 70, k = 3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toList == List(1L, 3L, 2L))
    // hand arithmetic: pick-2 scores are (70*990000-30*1000000)/100 vs
    // 70*800000/100
    val step2 = out(1)
    assert(step2.getAs[Long]("mmr_micro") == 560000L)
    assert(out(2).getAs[Long]("max_sim_micro") == 1000000L)
  }

  test("mmr: rank 1 is always the relevance argmax; determinism across runs") {
    val cand = Seq((5L, 40L), (6L, 90L), (7L, 60L)).toDF("id", "rel")
    val emb = Seq(
      (5L, Array(1f, 0f, 0f, 0f)), (6L, Array(0.6f, 0.8f, 0f, 0f)),
      (7L, Array(0f, 0f, 1f, 0f))).toDF("vid", "e")
    def run() = Fusion.mmrRerank(cand, "id", "rel", emb, "vid", "e")
      .collect().map(_.toSeq).toList
    val a = run()
    assert(a.head.head == 6L) // highest relevance leads
    assert(a == run())
  }

  test("rrf: absent list membership contributes zero, never null") {
    val a = Seq((1L, 1)).toDF("id", "rank")
    val b = Seq((2L, 1)).toDF("id", "rank")
    val rows = Fusion.reciprocalRank(Seq("a" -> a, "b" -> b), "id", "rank")
      .collect()
    assert(rows.forall(!_.isNullAt(rows.head.fieldIndex("rrf_micro"))))
    assert(rows.find(_.getAs[Long]("id") == 1L).get
      .isNullAt(rows.head.fieldIndex("rank_b")))
  }
}
