package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kcore: the textbook cascade — a pendant chain peels away round by round") {
    // triangle {1,2,3} plus chain 3-4-5: 2-core must peel 5 (deg 1),
    // THEN 4 (deg drops to 1) — a plain degree>=2 filter would keep 4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val out = Graph.kCore(e, "u", "v", k = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_degree")).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcore: k above the densest degree leaves an empty core") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(Graph.kCore(e, "u", "v", k = 3).collect().isEmpty)
  }

  test("kcore: parallel edges and both orientations count a neighbor once") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L))
      .toDF("u", "v")
    val out = Graph.kCore(e, "u", "v", k = 2).collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Long]("core_degree") == 2L))
  }

  test("kcore: k=1 keeps every non-isolated node") {
    val e = Seq((1L, 2L), (3L, 4L)).toDF("u", "v")
    val out = Graph.kCore(e, "u", "v", k = 1).collect()
    assert(out.map(_.getAs[Long]("node")).sorted.toList == List(1L, 2L, 3L, 4L))
  }

  test("kcore: every surviving node has core_degree >= k (invariant)") {
    val rnd = new scala.util.Random(7)
    val e = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.toDF("u", "v")
    val out = Graph.kCore(e, "u", "v", k = 4).collect()
    assert(out.forall(_.getAs[Long]("core_degree") >= 4L))
  }
}
