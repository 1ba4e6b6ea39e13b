package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CartTree

class CartTreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fit(rows: Seq[(Long, Long, Boolean)]) = {
    import spark.implicits._
    CartTree.fitDepth2(rows.toDF("x", "z", "y"), Seq("x", "z"), "y")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.toString),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        Option(r.get(6)).map(_.asInstanceOf[Long]))))
      .toMap
  }

  test("hand-computed tree: tie-broken root, pure-left leaf, split right") {
    // x=0: 4 negatives; x=1: 2+/2-; x=2: 4 positives. z is constant (no
    // candidate: a single bin can never leave the right side non-empty).
    // Root candidates on x: thr 0 -> wg = (4*0 + 8*375000)/12 = 250000;
    // thr 1 -> wg = (8*375000 + 4*0)/12 = 250000. Exact tie -> smaller
    // threshold wins. Parent gini = 500000 -> gain 250000.
    val rows =
      (1 to 4).map(_ => (0L, 7L, false)) ++
        Seq((1L, 7L, true), (1L, 7L, true), (1L, 7L, false), (1L, 7L, false)) ++
        (1 to 4).map(_ => (2L, 7L, true))
    val got = fit(rows)
    assert(got("root") == ((12L, 6L, 500000L, Some("x"), Some(0L), Some(250000L))))
    // left child is pure -> terminal leaf, no grandchildren
    assert(got("L") == ((4L, 0L, 0L, None, None, None)))
    assert(!got.contains("LL") && !got.contains("LR"))
    // right child (8 rows, 6 pos, gini 375000): split x<=1 ->
    // wg = (4*500000 + 4*0)/8 = 250000, gain 125000
    assert(got("R") == ((8L, 6L, 750000L, Some("x"), Some(1L), Some(125000L))))
    assert(got("RL") == ((4L, 2L, 500000L, None, None, None)))
    assert(got("RR") == ((4L, 4L, 1000000L, None, None, None)))
    assert(got.size == 5)
  }

  test("feature name breaks exact wg ties (f asc before thr asc)") {
    // x and z are identical copies -> every candidate ties; 'x' < 'z'
    val rows = Seq((0L, 0L, false), (0L, 0L, false), (1L, 1L, true), (1L, 1L, true))
    val got = fit(rows)
    assert(got("root")._4 == Some("x") && got("root")._5 == Some(0L))
    // both children pure -> 3 rows total
    assert(got.size == 3 && got("L")._2 == 0L && got("R")._2 == 2L)
  }

  test("uninformative frame fails loudly instead of emitting a zero-gain root") {
    val rows = Seq((0L, 0L, true), (1L, 1L, true), (2L, 2L, true))
    val e = intercept[IllegalArgumentException](fit(rows))
    assert(e.getMessage.contains("no informative root split"))
  }

  private def stumps(rows: Seq[(Long, Long, Long, Boolean)], bags: Int) = {
    import spark.implicits._
    CartTree.baggedStumps(rows.toDF("id", "x", "z", "y"),
      Seq("x", "z"), "y", "id", bags)
      .collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)).map(_.toString),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3))))
      .toMap
  }

  test("bagged stumps: separable data gives perfect members and ensemble") {
    // x separates y exactly; every bag (whatever md5 keeps) learns x<=0
    val rows = (1L to 40L).map(i => (i, i % 2, 7L, i % 2 == 1L))
    val got = stumps(rows, bags = 3)
    assert(got.keySet == Set("bag1", "bag2", "bag3", "ensemble"))
    for (b <- Seq("bag1", "bag2", "bag3")) {
      assert(got(b)._1 == Some("x") && got(b)._2 == Some(0L))
      assert(got(b)._3 == 1000000L) // evaluated on the FULL frame
    }
    assert(got("ensemble") == ((None, None, 1000000L)))
  }

  test("bagged stumps: deterministic across runs; bags must be odd") {
    val rows = (1L to 60L).map(i =>
      (i, i % 3, (i / 7) % 4, (i % 3 == 0) != (i % 13 == 0)))
    assert(stumps(rows, 5) == stumps(rows, 5))
    intercept[IllegalArgumentException](stumps(rows, 4))
  }

  test("boostedStumps: reweighting flips the round-2 split; ensemble beats every member") {
    import graft.operators.CartTree
    // counts: (fa, fb, y): A (0,0,1) x3, B (0,1,1) x1, C (1,0,0) x3,
    // D (1,1,1) x2. Round 1 picks fa<=0 (weighted gini 266666 < fb's
    // 333333), votes L=1 R=0, misses D (w 2 -> werr 222222), then D's
    // weights double. Round 2's weighted search now prefers fb<=0
    // (272727 < fa's 311687) — the boosting flip — votes L=1 (tie->1)
    // R=1, misses C (w 3 of 11 -> werr 272727). Round 3 keeps fb with
    // votes L=0 R=1 (werr 3/14). Members score 7/9, 6/9, 6/9 unweighted;
    // the majority vote scores 9/9.
    import spark.implicits._
    val rows =
      Seq.fill(3)((0L, 0L, true)) ++ Seq((0L, 1L, true)) ++
      Seq.fill(3)((1L, 0L, false)) ++ Seq.fill(2)((1L, 1L, true))
    val out = CartTree.boostedStumps(rows.toDF("fa", "fb", "y"),
      Seq("fa", "fb"), "y", rounds = 3)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5)), r.getAs[Long]("acc_micro")))
      .toMap
    assert(out("round1") == ((Some("fa"), Some(0L), Some(1L), Some(0L),
      Some(222222L), 777777L)))
    assert(out("round2") == ((Some("fb"), Some(0L), Some(1L), Some(1L),
      Some(272727L), 666666L)))
    assert(out("round3") == ((Some("fb"), Some(0L), Some(0L), Some(1L),
      Some(214285L), 666666L)))
    assert(out("ensemble") == ((None, None, None, None, None, 1000000L)))
  }
}
