package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).head().getAs[T]("v")

  test("token count: empties, whitespace runs, trim") {
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "a b  c") == 3)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "   ") == 0)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "") == 0)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), " x ") == 1)
  }

  test("subword count splits on class boundaries") {
    assert(one[Int](TextAnalysis.subwordCount(col("t")), "don't stop2day") == 6)
    // don | ' | t | stop | 2 | day  -> wait: digits+letters split
  }

  test("char class counts") {
    assert(one[Int](TextAnalysis.nPunct(col("t")), "a,b.c!") == 3)
    assert(one[Int](TextAnalysis.nDigits(col("t")), "a1b22") == 3)
  }

  test("langId picks profile with most hits; und when none") {
    assert(one[String](TextAnalysis.langId(col("t")), "the cat is on the mat") == "en")
    assert(one[String](TextAnalysis.langId(col("t")), "el gato en la casa de los perros") == "es")
    assert(one[String](TextAnalysis.langId(col("t")), "qwerty zxcvb") == "und")
  }

  test("quality gate rejects too-short and too-repetitive docs") {
    assert(!one[Boolean](TextAnalysis.qualityOk(col("t")), "hi"))
    val repetitive = Seq.fill(100)("spam").mkString(" ")
    assert(!one[Boolean](TextAnalysis.qualityOk(col("t")), repetitive))
    assert(one[Boolean](TextAnalysis.qualityOk(col("t")),
      "a reasonable document with plenty of distinct words in it"))
  }

  test("fingerprints: canonical md5 ignores case/extra whitespace, rolling is order-sensitive") {
    val a = one[String](TextAnalysis.canonicalFingerprint(col("t")), "Hello  World")
    val b = one[String](TextAnalysis.canonicalFingerprint(col("t")), "hello world")
    assert(a == b)
    val r1 = one[Long](TextAnalysis.rollingFingerprint(col("t")), "a b c")
    val r2 = one[Long](TextAnalysis.rollingFingerprint(col("t")), "c b a")
    assert(r1 != r2)
  }

  test("shingles: n-grams in order, short docs yield empty") {
    val sh = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingles(col("t"), 3).as("s"))
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val empty = Seq("a b").toDF("t")
      .select(TextAnalysis.shingles(col("t"), 3).as("s"))
      .head().getSeq[String](0)
    assert(empty.isEmpty)
  }
}
