package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RankAgree

class RankAgreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rboOf(a: Seq[String], b: Seq[String], k: Int = 3) = {
    def df(xs: Seq[String]) = xs.zipWithIndex
      .map { case (it, i) => ("q", it, (i + 1).toLong) }
      .toDF("key", "item", "r")
    RankAgree.rbo(df(a), df(b), "key", "item", "r", k)
      .collect().map(r => (r.getAs[Long]("overlap_at_k"),
        r.getAs[Long]("rbo_ppm"), r.getAs[Long]("residual_ppm")))
  }

  test("rbo: identical top-3 at p=0.9") {
    // terms 10^6*9^(d-1)*d/(10^d*d): 100000 + 90000 + 81000
    val out = rboOf(Seq("a", "b", "c"), Seq("a", "b", "c"))
    assert(out.toSeq == Seq((3L, 271000L, 729000L)))
  }

  test("rbo: a head swap costs more than a tail swap") {
    val head = rboOf(Seq("a", "b", "c"), Seq("b", "a", "c"))
    val tail = rboOf(Seq("a", "b", "c"), Seq("a", "c", "b"))
    assert(head.head._2 == 171000L && tail.head._2 == 226000L)
    assert(head.head._2 < tail.head._2)
  }

  test("rbo: disjoint rankings share nothing and emit no row") {
    assert(rboOf(Seq("a", "b"), Seq("x", "y")).isEmpty)
  }

  test("rbo: float powers would corrupt deep terms — k=32 stays exact") {
    // at d=20, 9^19 > 2^53: the BigInt spine must still produce the
    // exact truncated term; identical 32-item rankings give the exact
    // geometric series sum
    val items = (1 to 32).map(i => s"i$i")
    val out = rboOf(items, items, k = 32)
    val exact = (1 to 32).map { d =>
      (BigInt(1000000) * BigInt(9).pow(d - 1) * 1 * d /
        (BigInt(10).pow(d) * d)).toLong
    }.sum
    assert(out.head._2 == exact)
    assert(out.head._3 ==
      (BigInt(1000000) * BigInt(9).pow(32) / BigInt(10).pow(32)).toLong)
  }

  private def tauOf(rows: Seq[(Long, Long)]) =
    RankAgree.tauB(rows.map { case (x, y) => ("g", x, y) }
        .toDF("key", "xc", "yc"), "key", "xc", "yc")
      .collect().head

  test("tauB: perfect concordance and perfect discordance") {
    val up = tauOf(Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(up.getAs[Long]("tau2_pm") == 10000L)
    val down = tauOf(Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    assert(down.getAs[Long]("tau2_pm") == -10000L)
  }

  test("tauB: fully tied margin yields NULL, not a crash") {
    val r = tauOf(Seq((1L, 1L), (1L, 2L), (1L, 3L)))
    assert(r.isNullAt(r.fieldIndex("tau2_pm")))
  }

  test("tauB: matches brute-force pair enumeration with ties") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(40)((rnd.nextInt(4).toLong, rnd.nextInt(4).toLong))
    val got = tauOf(rows)
    var (conc, disc, tx, ty, tb) = (0L, 0L, 0L, 0L, 0L)
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      val s = (x2 - x1) * (y2 - y1)
      if (x1 == x2 && y1 == y2) tb += 1
      else if (x1 == x2) tx += 1
      else if (y1 == y2) ty += 1
      else if (s > 0) conc += 1
      else disc += 1
    }
    assert(got.getAs[Long]("concordant") == conc)
    assert(got.getAs[Long]("discordant") == disc)
    assert(got.getAs[Long]("ties_x") == tx + tb)
    assert(got.getAs[Long]("ties_y") == ty + tb)
    assert(got.getAs[Long]("ties_both") == tb)
    val n0 = 40L * 39 / 2
    val want = {
      val num = BigInt(10000) * BigInt(conc - disc) * BigInt(conc - disc)
      val den = BigInt(n0 - tx - tb) * BigInt(n0 - ty - tb)
      (if (conc >= disc) 1 else -1) * (num / den).toLong
    }
    assert(got.getAs[Long]("tau2_pm") == want)
  }
}
