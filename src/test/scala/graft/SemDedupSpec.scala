package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SemDedup, Similarity}

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4-dim toy corpus: 0/1/2 are near-identical (one semantic group),
  // 3 points elsewhere, 4 is opposite-sign (own LSH cell, far from all).
  private val corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.1f, 0.0f)),
    (1L, Array(1.0f, 0.01f, 0.1f, 0.0f)),
    (2L, Array(0.99f, 0.0f, 0.11f, 0.01f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.2f)),
    (4L, Array(-1.0f, -0.1f, -0.9f, 0.0f))
  ).toDF("vec_id", "embedding")

  private val lsh = Similarity.HyperplaneLsh(dim = 4, bits = 3)

  test("lsh semantic dedup keeps exactly one of a near-identical group") {
    val r = SemDedup.lshSemanticDedup(corpus, "embedding", "vec_id", lsh, threshold = 0.95)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Boolean]("kept")).toMap
    assert(r.size == 5, "decision table must cover every input row")
    val groupKept = Seq(0L, 1L, 2L).count(r)
    assert(groupKept == 1, s"near-identical group should keep exactly one, kept=$groupKept")
    assert(r(3L) && r(4L), "singletons are always kept")
  }

  test("kept member is the least-central of its duplicate group") {
    val rows = SemDedup.lshSemanticDedup(corpus, "embedding", "vec_id", lsh, threshold = 0.95)
      .collect().map(x => (x.getAs[Long]("id"), x.getAs[Double]("centrality"), x.getAs[Boolean]("kept")))
    val group = rows.filter(r => Set(0L, 1L, 2L)(r._1))
    // all three share a cell (near-identical vectors sign identically)
    val winner = group.minBy(r => (r._2, r._1))
    assert(group.filter(_._3).map(_._1).toSet == Set(winner._1),
      "survivor must be the (centrality, id)-minimal member")
  }

  test("threshold above the group's similarity keeps everything") {
    val r = SemDedup.lshSemanticDedup(corpus, "embedding", "vec_id", lsh, threshold = 0.999999)
      .collect().map(_.getAs[Boolean]("kept"))
    assert(r.forall(identity))
  }

  test("over-cap cells skip dedup conservatively (all kept)") {
    val r = SemDedup.lshSemanticDedup(corpus, "embedding", "vec_id", lsh,
        threshold = 0.95, cellCap = 1)
      .collect().map(_.getAs[Boolean]("kept"))
    assert(r.forall(identity), "capped cells must keep every member, never drop silently")
  }

  test("cell coverage sample keeps the least-central members, rank dense per cell") {
    val r = SemDedup.cellCoverageSample(corpus, "embedding", "vec_id", lsh, perCell = 2)
      .collect()
    assert(r.map(_.getAs[Int]("cell_rank")).forall(k => k >= 1 && k <= 2))
    // per cell: ranks are dense from 1 and ordered by (centrality, id)
    r.groupBy(_.getAs[Long]("cell")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(x => (x.getAs[Double]("centrality"), x.getAs[Long]("id")))
      assert(sorted.map(_.getAs[Int]("cell_rank")).toSeq == (1 to sorted.length))
    }
    // budget respected: the 3-member near-identical cell loses one member
    val full = SemDedup.cellCoverageSample(corpus, "embedding", "vec_id", lsh, perCell = 5)
    assert(full.count() == 5 && r.length < 5)
  }

  test("ivf variant agrees with lsh variant on the toy group") {
    val idx = Similarity.IvfIndex.train(corpus, "embedding", k = 2, sampleSize = 5, iters = 4)
    val r = SemDedup.ivfSemanticDedup(corpus, "embedding", "vec_id", idx, threshold = 0.95)
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Boolean]("kept")).toMap
    assert(r.size == 5)
    assert(Seq(0L, 1L, 2L).count(r) == 1, "same semantic group collapses to one survivor")
    assert(r(3L) && r(4L))
  }
}
