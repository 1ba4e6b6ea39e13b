package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkPredict

class LinkPredictSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ra(rows: Seq[(String, String)], maxBasket: Int = 256) =
    LinkPredict.resourceAllocation(
        rows.toDF("bk", "it"), "bk", "it", maxBasket)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("common_baskets"), r.getAs[Long]("ra_micros")))
      .toMap

  test("small baskets outrank hub baskets at equal co-occurrence") {
    // (a,b) meet in one 2-item basket; (c,d) in one 4-item basket
    val out = ra(Seq(
      ("b1", "a"), ("b1", "b"),
      ("b2", "c"), ("b2", "d"), ("b2", "e"), ("b2", "f")))
    assert(out(("a", "b")) == ((1L, 500000L)))
    assert(out(("c", "d")) == ((1L, 250000L)))
    assert(out(("a", "b"))._2 > out(("c", "d"))._2)
  }

  test("scores sum per shared basket and pairs are canonical a < b") {
    val out = ra(Seq(
      ("b1", "x"), ("b1", "y"),          // 2-basket: 500000
      ("b2", "y"), ("b2", "x"), ("b2", "z"))) // 3-basket: 333333
    assert(out(("x", "y")) == ((2L, 833333L)))
    assert(!out.contains(("y", "x")))
  }

  test("duplicate membership rows collapse before weighting") {
    val out = ra(Seq(("b1", "a"), ("b1", "a"), ("b1", "b")))
    assert(out(("a", "b")) == ((1L, 500000L)))
  }

  test("baskets above maxBasket are excluded by contract") {
    val hub = (1 to 5).map(i => ("hub", s"i$i"))
    val out = ra(hub ++ Seq(("b1", "i1"), ("b1", "i2")), maxBasket = 4)
    // only the 2-item basket survives
    assert(out == Map(("i1", "i2") -> ((1L, 500000L))))
  }

  test("items never sharing a basket are never materialized") {
    val out = ra(Seq(("b1", "a"), ("b1", "b"), ("b2", "c"), ("b2", "d")))
    assert(out.keySet == Set(("a", "b"), ("c", "d")))
  }
}
