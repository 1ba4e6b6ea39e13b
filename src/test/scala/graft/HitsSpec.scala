package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // u1 is a 2-basket hub; p1 and p2 tie on in-degree (2 each) but p1's
  // buyers include the hub — HITS must separate what degree cannot.
  private val edges = Seq(
    ("u1", "p1"), ("u1", "p3"), ("u2", "p1"),
    ("u3", "p2"), ("u4", "p2")).toDF("src", "dst")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Graph.hits(df, "src", "dst", iterations = 6).collect()
      .map(r => (r.getString(1), r.getString(0)) ->
        (r.getAs[Long]("score_micros"), r.getAs[Long]("degree"))).toMap

  test("degree ties, HITS doesn't: hub-backed authority outranks loner-backed") {
    val out = run(edges)
    val (p1, d1) = out(("authority", "p1"))
    val (p2, d2) = out(("authority", "p2"))
    assert(d1 == 2L && d2 == 2L)
    assert(p1 > p2, s"p1=$p1 p2=$p2")
    // stronger still: the hub component {u1,u2}->{p1,p3} has spectral
    // radius (3+sqrt(5))/2 ~ 2.618 vs 2 for the loner pair's {p2}, so
    // the power iteration concentrates there — in-degree-1 p3 OUTRANKS
    // in-degree-2 p2 (degree could never say that)
    assert(out(("authority", "p3"))._1 > p2)
    assert(p1 > out(("authority", "p3"))._1)
    assert(out(("hub", "u1"))._1 > out(("hub", "u2"))._1)
  }

  test("L1 mass is 1e6 per role up to per-node truncation loss") {
    val out = run(edges)
    val aMass = out.collect { case (("authority", _), (s, _)) => s }.sum
    val hMass = out.collect { case (("hub", _), (s, _)) => s }.sum
    assert(aMass <= 1000000L && aMass >= 1000000L - 3)
    assert(hMass <= 1000000L && hMass >= 1000000L - 4)
  }

  test("result is partitioning-invariant and duplicate edges collapse") {
    val noisy = edges.union(edges).repartition(7)
    assert(run(noisy) == run(edges))
  }

  test("symmetric graphs tie exactly") {
    val sym = Seq(("a", "x"), ("b", "x"), ("c", "y"), ("d", "y"))
      .toDF("src", "dst")
    val out = run(sym)
    assert(out(("authority", "x"))._1 == out(("authority", "y"))._1)
    assert(out(("hub", "a"))._1 == out(("hub", "d"))._1)
  }
}
