package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Assoc

class AssocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // txn1: {a,b,c}  txn2: {a,b}  txn3: {a}  txn4: {b,d}
  private val txns = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"),
    (4L, "b"), (4L, "d"))

  private def run(rows: Seq[(Long, String)], minPair: Long = 1L, cap: Int = 1000) =
    Assoc.rules(rows.toDF("txn", "item"), Seq("txn"), "item", minPair, cap)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap

  test("hand-computed support / confidence / lift on four baskets") {
    val got = run(txns)
    assert(got.size == 8) // {a,b}x2, {a,c}x2, {b,c}x2, {b,d}x2 directed
    // a->b: n_ab=2, n_a=3, n_b=3, N=4
    assert(got(("a", "b")) == ((2L, 3L, 3L, 4L, 5000L, 6666L, 8888L)))
    // b->a mirrors n_ab but swaps the confidence denominator
    assert(got(("b", "a")) == ((2L, 3L, 3L, 4L, 5000L, 6666L, 8888L)))
    // d->b: perfect confidence, lift = 1*4*1e4 DIV (1*3) = 13333 (> 1e4)
    assert(got(("d", "b")) == ((1L, 1L, 3L, 4L, 2500L, 10000L, 13333L)))
    // a->c: lift = 1*4*1e4 DIV (3*1) = 13333
    assert(got(("a", "c"))._7 == 13333L)
  }

  test("minPairCount floors the report to frequent pairs") {
    val got = run(txns, minPair = 2L)
    assert(got.keySet == Set(("a", "b"), ("b", "a")))
  }

  test("maxItemsPerTxn drops mega-baskets from counts, marginals and total") {
    // cap=2 excludes txn1 entirely: N=3, c vanishes, a->b now co-occurs once
    val got = run(txns, cap = 2)
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("b", "d"), ("d", "b")))
    assert(got(("a", "b")) == ((1L, 2L, 2L, 3L, 3333L, 5000L, 7500L)))
  }

  test("duplicate (txn, item) rows never inflate counts") {
    val got = run(txns ++ Seq((1L, "a"), (1L, "a"), (2L, "b")))
    assert(got(("a", "b")) == ((2L, 3L, 3L, 4L, 5000L, 6666L, 8888L)))
  }

  test("guards: key columns, support floor, cap minimum") {
    val df = txns.toDF("txn", "item")
    intercept[IllegalArgumentException](Assoc.rules(df, Nil, "item"))
    intercept[IllegalArgumentException](
      Assoc.rules(df, Seq("txn"), "item", minPairCount = 0L))
    intercept[IllegalArgumentException](
      Assoc.rules(df, Seq("txn"), "item", maxItemsPerTxn = 1))
  }
}
