package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Interval

class IntervalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cover(rows: Seq[(String, Long, Long)]) =
    Interval.unionCoverage(rows.toDF("k", "st", "en"), "k", "st", "en")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("covered"), r.getAs[Long]("longest_span"))).toMap

  test("overlap merges, gaps split, touching intervals merge (half-open)") {
    val out = cover(Seq(
      ("u", 0L, 10L), ("u", 5L, 15L),   // overlap -> [0,15)
      ("u", 15L, 20L),                  // touches: st == running max -> merges
      ("u", 30L, 40L)))                 // gap -> second island
    // union = [0,20) + [30,40) = 30; naive sum(len) would be 35
    assert(out("u") == ((4L, 2L, 30L, 20L)))
  }

  test("containment does not extend the island and later short ends don't reopen") {
    // [0,100) contains [10,20); [50,60) starts under the running max
    // even though the PREVIOUS row's end (20) is behind it
    val out = cover(Seq(("u", 0L, 100L), ("u", 10L, 20L), ("u", 50L, 60L)))
    assert(out("u") == ((3L, 1L, 100L, 100L)))
  }

  test("keys are independent and tied (st,en) rows are deterministic") {
    val out = cover(Seq(
      ("a", 0L, 5L), ("a", 0L, 5L), ("a", 0L, 5L), // identical triplet
      ("b", 0L, 1L), ("b", 2L, 3L)))
    assert(out("a") == ((3L, 1L, 5L, 5L)))
    assert(out("b") == ((2L, 2L, 2L, 1L)))
  }

  test("matches brute-force union on a randomized frame") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { _ =>
      val k = s"k${rnd.nextInt(5)}"
      val st = rnd.nextInt(1000).toLong
      (k, st, st + 1 + rnd.nextInt(50))
    }
    val got = cover(rows)
    rows.groupBy(_._1).foreach { case (k, iv) =>
      val covered = iv.flatMap(r => r._2 until r._3).toSet
      assert(got(k)._3 == covered.size.toLong, s"coverage mismatch for $k")
      // islands = count of covered points whose predecessor is uncovered
      val spans = covered.count(p => !covered.contains(p - 1))
      assert(got(k)._2 == spans.toLong, s"span count mismatch for $k")
    }
  }
}
