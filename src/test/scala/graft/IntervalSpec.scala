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

  test("packed-aggregate form equals the window form on a randomized frame") {
    val rnd = new scala.util.Random(99)
    val rows = (1 to 500).map { _ =>
      val k = s"k${rnd.nextInt(7)}"
      val st = rnd.nextInt(1000).toLong
      (k, st, st + 1 + rnd.nextInt(60))
    }
    val df = rows.toDF("k", "st", "en")
    val canon = (r: Array[org.apache.spark.sql.Row]) =>
      r.map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toMap
    val win = canon(Interval.unionCoverage(df, "k", "st", "en")
      .select("k", "n_events", "n_spans", "covered", "longest_span").collect())
    val agg = canon(Interval.unionCoverageAgg(df, "k", "st", "en")
      .select("k", "n_events", "n_spans", "covered", "longest_span").collect())
    assert(agg == win)
  }

  private def ovl(l: Seq[(String, Long, Long)], r: Seq[(String, Long, Long)],
                  bucket: Long) =
    Interval.overlapJoin(
        l.toDF("lid", "ls", "le"), "ls", "le",
        r.toDF("rid", "rs", "re"), "rs", "re", bucket)
      .select("lid", "rid").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet

  test("overlapJoin: half-open semantics — touching endpoints do not join") {
    val got = ovl(Seq(("a", 0L, 10L)), Seq(("x", 10L, 20L), ("y", 9L, 12L)), 4L)
    assert(got == Set(("a", "y")))
  }

  test("overlapJoin: a pair co-covering many buckets appears exactly once") {
    // both intervals span 25 buckets of width 4 — the meet-bucket rule
    // must collapse the 25 candidate meetings to one row
    val got = Interval.overlapJoin(
        Seq(("a", 0L, 100L)).toDF("lid", "ls", "le"), "ls", "le",
        Seq(("x", 1L, 99L)).toDF("rid", "rs", "re"), "rs", "re", 4L)
      .collect()
    assert(got.length == 1)
  }

  test("overlapJoin: containment, disjoint, and cross-bucket overlap") {
    val got = ovl(
      Seq(("a", 10L, 20L), ("b", 100L, 110L)),
      Seq(("in", 12L, 14L), ("cross", 18L, 25L), ("far", 50L, 60L)), 8L)
    assert(got == Set(("a", "in"), ("a", "cross")))
  }

  test("overlapJoin: matches brute force on a randomized frame") {
    val rnd = new scala.util.Random(7)
    val ls = (1 to 120).map(i => (s"l$i", rnd.nextInt(500).toLong, 0L))
      .map { case (id, st, _) => (id, st, st + 1 + rnd.nextInt(40)) }
    val rs = (1 to 120).map(i => (s"r$i", rnd.nextInt(500).toLong, 0L))
      .map { case (id, st, _) => (id, st, st + 1 + rnd.nextInt(40)) }
    val got = ovl(ls, rs, 16L)
    val want = (for {
      (li, lst, len) <- ls; (ri, rst, ren) <- rs
      if lst < ren && rst < len
    } yield (li, ri)).toSet
    assert(got == want)
  }

  test("overlapJoin: degenerate and negative intervals fail loudly") {
    intercept[Exception] {
      ovl(Seq(("a", 20L, 10L)), Seq(("x", 0L, 5L)), 4L)
    }
    intercept[Exception] {
      ovl(Seq(("a", -3L, 10L)), Seq(("x", 0L, 5L)), 4L)
    }
    // EMPTY [s, s) must fail REGARDLESS of bucket alignment (the r9
    // advice item): aligned (s a multiple of the bucket) already
    // tripped n < 1; the off-alignment case used to slip through with
    // n = 1 and could pair an empty interval via the strict predicate
    intercept[Exception] {
      ovl(Seq(("a", 8L, 8L)), Seq(("x", 0L, 50L)), 4L) // aligned
    }
    intercept[Exception] {
      ovl(Seq(("a", 9L, 9L)), Seq(("x", 0L, 50L)), 4L) // off-aligned
    }
  }

  test("overlapJoin: shared column names are rejected") {
    intercept[IllegalArgumentException] {
      Interval.overlapJoin(
        Seq(("a", 0L, 1L)).toDF("id", "ls", "le"), "ls", "le",
        Seq(("x", 0L, 1L)).toDF("id", "rs", "re"), "rs", "re", 4L)
    }
  }
}
