package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.BudgetAlloc

class BudgetAllocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fill(strata: Seq[(String, Long, Long)], budget: Long) =
    BudgetAlloc.waterFill(
      strata.toDF("s", "cap", "weight"), "s", "cap", "weight",
      Seq(budget).toDF("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(3), r.getLong(4)))).toMap

  test("no binding caps: allocation is weight-proportional") {
    val out = fill(Seq(("a", 1000L, 1L), ("b", 1000L, 3L)), 400L)
    assert(out("a") == ((1000L, false, 100L)))
    assert(out("b") == ((1000L, false, 300L)))
  }

  test("a small heavy-weight stratum saturates; surplus redistributes by weight") {
    // b wants 3/4 of 800 = 600 but caps at 100; leftover 700 splits 1:2
    val out = fill(Seq(("a", 1000L, 1L), ("b", 100L, 3L), ("c", 1000L, 2L)), 800L)
    assert(out("b") == ((100L, true, 100L)))
    assert(out("a")._3 == (800L - 100L) / 3L)       // 1/(1+2) of leftover
    assert(out("c")._3 == 2L * (800L - 100L) / 3L)
  }

  test("budget above total capacity saturates everything at cap") {
    val out = fill(Seq(("a", 10L, 1L), ("b", 20L, 5L)), 1000L)
    assert(out("a") == ((10L, true, 10L)))
    assert(out("b") == ((20L, true, 20L)))
  }

  test("feasibility invariants: alloc <= cap and sum(alloc) <= budget") {
    val cases = Seq(
      (Seq(("a", 7L, 3L), ("b", 999L, 1L), ("c", 50L, 2L), ("d", 3L, 3L)), 500L),
      (Seq(("a", 1L, 1L), ("b", 1L, 1L)), 1L),
      (Seq(("a", 100L, 2L), ("b", 100L, 2L), ("c", 5L, 5L)), 150L))
    for ((strata, b) <- cases) {
      val out = fill(strata, b)
      val caps = strata.map { case (s, c, _) => s -> c }.toMap
      out.foreach { case (s, (_, _, alloc)) =>
        assert(alloc >= 0L && alloc <= caps(s), s"alloc bound for $s") }
      assert(out.values.map(_._3).sum <= b, s"over-commit at budget $b")
    }
  }

  test("cascading saturation: two strata below the waterline both cap out") {
    val out = fill(Seq(("a", 5L, 5L), ("b", 10L, 5L), ("c", 10000L, 1L)), 600L)
    assert(out("a")._2 && out("b")._2)
    assert(out("a")._3 == 5L && out("b")._3 == 10L)
    assert(out("c")._3 == 585L) // leftover 585 to the only unsaturated
  }
}
