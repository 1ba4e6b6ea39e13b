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
