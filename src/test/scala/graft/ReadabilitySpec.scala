package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Readability

class ReadabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(docs: Seq[(String, String)]) =
    Readability.fleschBySource(docs.toDF("source", "text"), "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("hand-computed Flesch score in milli-points") {
    // w=6, sentences=2, vowel groups=6: wps=3000, spw=1000
    // score = 206835 - 1015*3000/1000 - 84600*1000/1000 = 119190
    val got = report(Seq(("a", "The cat sat. The dog ran.")))
    assert(got("a") == ((1L, 0L, 119190L)))
  }

  test("empty and whitespace docs are excluded but counted") {
    val got = report(Seq(("a", ""), ("a", "   "), ("a", "One word.")))
    assert(got("a")._1 == 1L && got("a")._2 == 2L)
  }

  test("a run-on garble scores far below plain prose") {
    val runOn = ("r", ("word " * 80).trim) // 80 words, no sentence break
    val prose = ("p", Seq.fill(16)("He ran. She saw him go.").mkString(" "))
    val got = report(Seq(runOn, prose))
    assert(got("r")._3 < got("p")._3 - 30000L,
      s"run-on ${got("r")._3} vs prose ${got("p")._3}")
  }

  test("band counters: a very easy doc lands in n_easy") {
    val out = Readability.fleschBySource(
        Seq(("a", "Go. Do. So. No.")).toDF("source", "text"), "text", "source")
      .collect().head
    assert(out.getAs[Long]("n_easy") == 1L && out.getAs[Long]("n_hard") == 0L)
  }
}
