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

  test("rfmSegments: counting quintiles per metric, inverted recency, dollar-grain monetary") {
    import graft.operators.Audience
    // horizon day = 10; per user (r, f, m_cents):
    // u1 (0, 1, 100)  u2 (1, 2, 400)  u3 (2, 1, 300)
    // u4 (0, 2, 200)  u5 (9, 1, 500)
    val df = Seq(
      ("u1", 10L, 100L),
      ("u2", 9L, 250L), ("u2", 9L, 150L),
      ("u3", 8L, 300L),
      ("u4", 10L, 120L), ("u4", 9L, 80L),
      ("u5", 1L, 500L)).toDF("e", "day", "cents")
    val out = Audience.rfmSegments(df, "e", "day", "cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // r cells desc (9,2,1,0 with n 1,1,1,2): scores 1,2,3,4
    // f cells asc (1 n3, 2 n2): scores 1, 1+(5*3 DIV 5)=4
    // m dollar cells asc (1..5, n1 each): scores 1..5
    assert(out == Set(
      (4L, 1L, 1L, 1L, 100L),   // u1
      (3L, 4L, 4L, 1L, 400L),   // u2
      (2L, 1L, 3L, 1L, 300L),   // u3
      (4L, 4L, 2L, 1L, 200L),   // u4
      (1L, 1L, 5L, 1L, 500L))) // u5
  }

  test("rfmSegments: ties share a score and collapse into one segment row") {
    import graft.operators.Audience
    // three identical users -> every metric one cell -> all scores 1,
    // one segment row with n_entities 3
    val df = Seq(("a", 5L, 100L), ("b", 5L, 100L), ("c", 5L, 100L))
      .toDF("e", "day", "cents")
    val out = Audience.rfmSegments(df, "e", "day", "cents").collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((1L, 1L, 1L, 3L, 300L)))
  }
}
