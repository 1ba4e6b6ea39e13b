package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audience

class AudienceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def overlap(rows: Seq[(Long, String)], types: Seq[String]) =
    Audience.overlapMatrix(rows.toDF("u", "et"), "u", "et", types)
      .collect().map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
          r.getAs[Long]("n_any"), Option(r.get(r.fieldIndex("jaccard_pm")))))).toMap

  test("overlap matrix: hand-computed intersections and Jaccard") {
    // u1 {a,b}, u2 {a}, u3 {b,c}, u4 {c}
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "b"), (3L, "c"), (4L, "c"))
    val out = overlap(rows, Seq("a", "b", "c"))
    assert(out(("a", "b")) == ((2L, 2L, 1L, 3L, Some(333L))))
    assert(out(("a", "c")) == ((2L, 2L, 0L, 4L, Some(0L))))
    assert(out(("b", "c")) == ((2L, 2L, 1L, 3L, Some(333L))))
  }

  test("identical memberships read Jaccard 1000, repeats don't double-count") {
    val rows = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (2L, "b"))
    val out = overlap(rows, Seq("a", "b"))
    assert(out(("a", "b")) == ((2L, 2L, 2L, 2L, Some(1000L))))
  }

  test("an audience type absent from the data reports empty-set NULL Jaccard") {
    val rows = Seq((1L, "a"), (2L, "a"))
    val out = overlap(rows, Seq("ghost1", "ghost2"))
    assert(out(("ghost1", "ghost2")) == ((0L, 0L, 0L, 0L, None)))
  }

  test("duplicate or too-few types fail fast") {
    val df = Seq((1L, "a")).toDF("u", "et")
    intercept[IllegalArgumentException](
      Audience.overlapMatrix(df, "u", "et", Seq("a")))
    intercept[IllegalArgumentException](
      Audience.overlapMatrix(df, "u", "et", Seq("a", "a")))
  }
}
