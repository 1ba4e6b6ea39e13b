package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeansQuant

class KMeansQuantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("two well-separated blobs: every point lands with its blob's seed") {
    // blob A near (1, 0), blob B near (-1, 0); seeds 1 (A) and 4 (B)
    val rows = Seq(
      1L -> Seq(1.0f, 0.1f), 2L -> Seq(0.9f, -0.1f), 3L -> Seq(1.1f, 0.0f),
      4L -> Seq(-1.0f, 0.1f), 5L -> Seq(-0.9f, -0.1f), 6L -> Seq(-1.1f, 0.0f))
    val got = KMeansQuant.lloydAssign(df(rows), "embedding", "vec_id",
        initIds = Seq(1L, 4L), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("assignment is deterministic across partitionings (integer arithmetic, order-free sums)") {
    val rows = (1L to 40L).map(i =>
      i -> Seq(((i * 37 % 19).toFloat - 9) / 10, ((i * 53 % 17).toFloat - 8) / 10))
    val a = KMeansQuant.lloydAssign(df(rows).repartition(7), "embedding", "vec_id",
      initIds = Seq(1L, 2L, 3L), iters = 3).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = KMeansQuant.lloydAssign(df(rows).repartition(1), "embedding", "vec_id",
      initIds = Seq(1L, 2L, 3L), iters = 3).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("equidistant point ties to the lower cluster id") {
    val rows = Seq(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(-1.0f, 0.0f), 3L -> Seq(0.0f, 0.0f))
    // one iteration: point 3 is equidistant from both seeds -> cluster 0
    val got = KMeansQuant.lloydAssign(df(rows), "embedding", "vec_id",
        initIds = Seq(1L, 2L), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 0L)
  }

  test("an emptied cluster keeps its previous centroid instead of vanishing") {
    // seed 2 is strictly farther from every point than seed 1 ->
    // cluster 1 empties after the first assignment, but k stays 2 and
    // the far seed's centroid persists (assignable again in principle)
    val rows = Seq(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(10.0f, 10.0f),
      3L -> Seq(0.1f, 0.0f), 4L -> Seq(0.0f, 0.1f))
    val got = KMeansQuant.lloydAssign(
        df(rows).filter($"vec_id" =!= 2L).unionByName(df(rows).filter($"vec_id" === 2L)),
        "embedding", "vec_id", initIds = Seq(1L, 2L), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 itself sits on the far centroid; the near points stay in cluster 0
    assert(got(1L) == 0L && got(3L) == 0L && got(4L) == 0L && got(2L) == 1L)
  }

  test("guards: duplicate/missing init ids, zero iterations") {
    val rows = Seq(1L -> Seq(1.0f), 2L -> Seq(2.0f))
    intercept[IllegalArgumentException](
      KMeansQuant.lloydAssign(df(rows), "embedding", "vec_id", Seq(1L, 1L), 1))
    intercept[IllegalArgumentException](
      KMeansQuant.lloydAssign(df(rows), "embedding", "vec_id", Seq(1L, 9L), 1))
    intercept[IllegalArgumentException](
      KMeansQuant.lloydAssign(df(rows), "embedding", "vec_id", Seq(1L), 0))
  }

  test("silhouette: exact scores for separated blobs with a boundary point") {
    val rows = Seq(
      1L -> Seq(1.0f, 0.0f), 2L -> Seq(1.0f, 0.0f), 3L -> Seq(1.0f, 0.0f),
      4L -> Seq(-1.0f, 0.0f), 5L -> Seq(-1.0f, 0.0f), 6L -> Seq(-1.0f, 0.0f),
      7L -> Seq(0.0f, 0.0f)) // between the blobs; ties into cluster 0
    val got = KMeansQuant.silhouetteReport(df(rows), "embedding", "vec_id",
        initIds = Seq(1L, 4L), iters = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // hand replay: the boundary point joins cluster 0, dragging its
    // centroid to 3/4 -> perfect points score (1 - 1/64)*10^4 = 9843,
    // the boundary point (1 - 0.5625/1... ) = 4375, mean = 8476;
    // cluster 1 keeps identical points on their own centroid: s = 10^4
    assert(got(0L) == ((4L, 8476L, 4375L)))
    assert(got(1L) == ((3L, 10000L, 10000L)))
  }

  test("silhouette is scale-invariant: doubling coordinates changes nothing") {
    val base = Seq(
      1L -> Seq(1.0f, 0.5f), 2L -> Seq(0.75f, 0.5f), 3L -> Seq(1.25f, 0.25f),
      4L -> Seq(-1.0f, -0.5f), 5L -> Seq(-0.75f, -0.25f), 6L -> Seq(-1.25f, 0.0f))
    val doubled = base.map { case (i, v) => i -> v.map(_ * 2.0f) }
    def rep(rows: Seq[(Long, Seq[Float])]) =
      KMeansQuant.silhouetteReport(df(rows), "embedding", "vec_id",
        initIds = Seq(1L, 4L), iters = 2).collect().toSeq.map(_.toSeq)
    // exactly representable halves: x4 distances cancel in every ratio
    assert(rep(base) == rep(doubled))
  }

  test("silhouette guard: k = 1 is rejected") {
    val rows = Seq(1L -> Seq(1.0f, 0.0f))
    intercept[IllegalArgumentException] {
      KMeansQuant.silhouetteReport(df(rows), "embedding", "vec_id",
        initIds = Seq(1L), iters = 1)
    }
  }
}
