package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Survivorship

class SurvivorshipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    // cluster A: modal source=web (2 of 3); lang ties en/fr 1-1 -> "en"
    ("A", Some("web"), Some("en")),
    ("A", Some("web"), Some("fr")),
    ("A", Some("api"), None),
    // cluster B: all-null source survives as null; lang modal "de"
    ("B", None, Some("de")),
    ("B", None, Some("de")),
    // cluster C: singleton
    ("C", Some("app"), Some("es")))
    .toDF("cl", "source", "lang")

  private def run(min: Long) =
    Survivorship.goldenRecords(rows, "cl", Seq("source", "lang"), min)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3))))).toMap

  test("modal non-null per attribute; ties to smallest; all-null survives null") {
    val got = run(1L)
    assert(got == Map(
      "A" -> ((3L, Some("web"), Some("en"))),
      "B" -> ((2L, None, Some("de"))),
      "C" -> ((1L, Some("app"), Some("es")))))
  }

  test("minMembers gates singleton clusters out") {
    assert(run(2L).keySet == Set("A", "B"))
  }

  test("guards: attributes required, minMembers >= 1") {
    intercept[IllegalArgumentException](
      Survivorship.goldenRecords(rows, "cl", Nil))
    intercept[IllegalArgumentException](
      Survivorship.goldenRecords(rows, "cl", Seq("source"), 0L))
  }
}
