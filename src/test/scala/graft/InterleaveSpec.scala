package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Interleave

class InterleaveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def draft(a: Seq[Long], b: Seq[Long], kOut: Int,
                    salt: String = "s") = {
    def df(xs: Seq[Long]) = xs.zipWithIndex
      .map { case (it, i) => ("q", it, (i + 1).toLong) }
      .toDF("key", "item", "r")
    Interleave.teamDraft(df(a), df(b), "key", "item", "r", kOut, salt)
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Long]("item"),
        r.getAs[Int]("team")))
  }

  test("identical rankings interleave to the same list, teams alternate per round") {
    val out = draft(Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L), 4)
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
    // each round contributes one pick per team
    assert(out.map(_._3).grouped(2).forall(_.toSet == Set(0, 1)))
  }

  test("disjoint rankings: every round one pick per team, deterministic") {
    val a = (1L to 10L).toSeq
    val b = (11L to 20L).toSeq
    val out = draft(a, b, 10)
    assert(out.length == 10)
    assert(out.count(_._3 == 0) == 5 && out.count(_._3 == 1) == 5)
    // a team's own picks come in ITS rank order
    val teamA = out.filter(_._3 == 0).map(_._2).toSeq
    assert(teamA == teamA.sorted)
    assert(draft(a, b, 10).toSeq == out.toSeq) // same salt -> same draft
    assert(draft(a, b, 10, salt = "other").toSeq != out.toSeq)
  }

  test("shared items are drafted once; exhausted teams skip") {
    val out = draft(Seq(1L, 2L), Seq(1L, 3L), 4)
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L))
    assert(out.map(_._2).distinct.length == out.length)
    val short = draft(Seq(1L), Seq(2L), 4)
    assert(short.map(_._2).toSet == Set(1L, 2L))
  }
}
