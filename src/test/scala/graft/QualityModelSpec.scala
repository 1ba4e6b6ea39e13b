package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.QualityModel

class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // independent replay of the scoring path: JDK md5, big-endian first 8
  // bytes as the signed 64-bit hash (the portable-hash contract), plain
  // Scala arithmetic for bucket/weight/sum — no graft code involved
  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }
  private def refScore(text: String, w: Array[Long], bias: Long): Long = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    toks.map { t =>
      val b = ((refHash(t) % w.length) + w.length) % w.length
      w(b.toInt)
    }.sum + bias
  }

  test("pinnedWeights: deterministic, bounded, sign-mixed") {
    val w = QualityModel.pinnedWeights(1024, seed = 7L)
    assert(w.length == 1024)
    assert(w sameElements QualityModel.pinnedWeights(1024, seed = 7L))
    assert(w.forall(x => x >= -999L && x <= 999L))
    assert(w.count(_ > 0) > 300 && w.count(_ < 0) > 300) // balanced-ish
    assert(!(w sameElements QualityModel.pinnedWeights(1024, seed = 8L)))
  }

  test("scoreMicros matches an independent JDK-md5 replay token for token") {
    val w = QualityModel.pinnedWeights(64, seed = 3L)
    val docs = Seq(
      (1L, "The quick brown fox"),
      (2L, "the the the"), // repeated token → weight counted 3×
      (3L, "  Mixed   CASE  and\tspacing  "),
      (4L, "")).toDF("doc_id", "text")
    val got = QualityModel.scored(docs, "text", "doc_id", w,
        biasMicros = 100L, thresholdMicros = 0L)
      .orderBy("doc_id").collect()
    val expected = Seq(
      refScore("The quick brown fox", w, 100L),
      refScore("the the the", w, 100L),
      refScore("Mixed CASE and spacing", w, 100L),
      100L) // empty text: bias only
    assert(got.map(_.getAs[Long]("score_micros")).toSeq == expected)
    assert(got.map(_.getAs[Long]("n_tokens")).toSeq == Seq(4L, 3L, 4L, 0L))
    assert(got.map(_.getAs[Boolean]("keep")).toSeq ==
      expected.map(_ >= 0L))
  }

  test("repeated-token linearity: score(t t) - score(t) == weight(t)") {
    val w = QualityModel.pinnedWeights(64, seed = 3L)
    val docs = Seq((1L, "alpha"), (2L, "alpha alpha")).toDF("doc_id", "text")
    val s = QualityModel.scored(docs, "text", "doc_id", w, 0L, 0L)
      .orderBy("doc_id").collect().map(_.getAs[Long]("score_micros"))
    assert(s(1) - s(0) == s(0)) // bias 0: single-token score IS the weight
  }

  test("the scoring plan is a zero-shuffle scan (no Exchange)") {
    val w = QualityModel.pinnedWeights(1024, seed = 7L)
    val plan = QualityModel.scored(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "text", "doc_id", w, 0L, 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
