package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.MarkovAttribution

class MarkovAttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = MarkovAttribution.Scale

  /** (user, step, etype) rows -> the operator's input frame; one user
    * per journey keeps sessions disjoint. */
  private def journeys(js: Seq[Seq[String]], iters: Int = 16) = {
    val rows = js.zipWithIndex.flatMap { case (path, u) =>
      path.zipWithIndex.map { case (e, i) =>
        (u.toLong, (u * 10000 + i).toLong, i.toLong, e) }
    }
    val df = rows.toDF("user_id", "event_id", "step", "etype")
      .withColumn("ts", timestamp_seconds(col("step")))
    MarkovAttribution.removalEffects(df, "user_id", "ts", "etype", "event_id",
        convType = "purchase", iters = iters)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("a single deterministic converting path: p = 1, removal kills it") {
    val out = journeys(Seq.fill(6)(Seq("click", "purchase")))
    assert(out("(none)") == ((S, 0L)))
    assert(out("click") == ((0L, 10000L)))
  }

  test("disjoint halves: removal credit goes only to the converting branch") {
    val out = journeys(
      Seq.fill(5)(Seq("click", "purchase")) ++ Seq.fill(5)(Seq("view")))
    assert(out("(none)") == ((S / 2, 0L)))
    assert(out("click") == ((0L, 10000L)))
    assert(out("view") == ((S / 2, 0L))) // non-converting branch: no credit
  }

  test("journeys route around a removed channel: partial removal effect") {
    val out = journeys(Seq(Seq("view", "purchase"), Seq("click", "purchase")))
    assert(out("(none)")._1 == S)
    assert(out("click") == ((S / 2, 5000L)))
    assert(out("view") == ((S / 2, 5000L)))
  }

  test("sessions truncate at the first conversion: later events never become states") {
    val out = journeys(Seq.fill(4)(Seq("click", "purchase", "view")))
    assert(out.keySet == Set("(none)", "click")) // no 'view' channel row
    assert(out("(none)") == ((S, 0L)))
  }

  test("the metric is K-step absorption: a path longer than K scores zero") {
    val path = Seq("c1", "c2", "c3", "purchase") // needs 4 transitions
    assert(journeys(Seq(path), iters = 3)("(none)")._1 == 0L)
    assert(journeys(Seq(path), iters = 4)("(none)")._1 == S)
  }

  test("truncating division composes: a 2/3 branch times a 1/2 branch") {
    // START: 3 journeys; 2 go click->purchase, 1 goes click->(end)
    val out = journeys(Seq(
      Seq("click", "purchase"), Seq("click", "purchase"), Seq("click")))
    // v(click) = 2S/3 trunc; v(START) = 3*(2S/3)/3 = 2S/3 trunc
    val vClick = BigInt(2) * S / 3
    assert(out("(none)")._1 == (BigInt(3) * vClick / 3).toLong)
  }
}
