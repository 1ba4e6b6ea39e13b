package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.HashEmbed

class HashEmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // independent replay: JDK md5 → signed 64-bit → sign bits
  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }
  private def refEmbed(text: String, dim: Int): Seq[Long] = {
    val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    (0 until dim).map(j => toks.map(t => ((refHash(t) >> j) & 1L) * 2L - 1L).sum)
  }

  test("embed matches an independent JDK-md5 sign-bit replay; empty text is the zero vector") {
    val docs = Seq((1L, "spark shuffles partitions"), (2L, "the THE the"),
      (3L, "")).toDF("doc_id", "text")
    val got = docs.select(HashEmbed.embed(col("text"), 8))
      .collect().map(_.getSeq[Long](0))
    assert(got(0) == refEmbed("spark shuffles partitions", 8))
    assert(got(1) == refEmbed("the the the", 8))
    assert(got(1).forall(x => x == 3L || x == -3L)) // one token 3× → ±3 per dim
    assert(got(2) == Seq.fill(8)(0L))
  }

  test("embedding magnitudes are SimHash's pre-threshold state: signs agree with simhash bits") {
    // sign(v[j]) must equal the SimHash bit convention for any doc with
    // no zero component — an ODD number of distinct tokens guarantees
    // every ±1 sum is nonzero
    val text = "alpha beta gamma delta epsilon"
    val v = refEmbed(text, 16)
    assert(v.forall(_ != 0))
    val df = Seq(Tuple1(text)).toDF("text")
    val sim = df.select(graft.plans.SketchFunctions.simhash(
        graft.plans.SketchFunctions.portableHash64(
          graft.functions.TextAnalysis.tokens(col("text")))))
      .head().getLong(0)
    (0 until 16).foreach { j =>
      val bit = (sim >> j) & 1L
      assert((v(j) > 0) == (bit == 1L), s"dim $j sign mismatch")
    }
  }

  test("cosineTopK: huge repetitive docs do not overflow the norm product into NaN-first ranking") {
    // n2 ≈ dim·t² for t identical tokens; two ~15k-token docs make
    // n2·qn ≈ 1.3e19 > Long.MaxValue — a Long multiply wraps negative,
    // sqrt goes NaN, and Spark ranks NaN FIRST on desc. The double
    // product must rank the true twin first instead.
    val huge = Seq.fill(15000)("tokentoken").mkString(" ")
    val docs = Seq(
      (0L, huge),
      (1L, huge),                           // true twin: cosine 1.0
      (2L, Seq.fill(15000)("other").mkString(" ")),
      (3L, "tiny doc")).toDF("doc_id", "text")
    val r = HashEmbed.cosineTopK(docs, "text", "doc_id", queryId = 0L, k = 3, dim = 16)
      .collect()
    assert(r.head.getLong(0) == 1L)
    assert(!r.exists(x => x.getAs[Double]("cosine").isNaN))
    assert(math.abs(r.head.getAs[Double]("cosine") - 1.0) < 1e-12)
    // and a missing query id is a pointed error, not an empty-iterator crash
    val e = intercept[IllegalArgumentException](
      HashEmbed.cosineTopK(docs, "text", "doc_id", queryId = 99L, k = 3, dim = 16))
    assert(e.getMessage.contains("not present"))
  }

  test("cosineTopK: identical text scores cosine 1.0 first; zero-norm docs excluded") {
    val docs = Seq(
      (0L, "parquet scan pruning pushdown"),
      (1L, "parquet scan pruning pushdown"), // exact twin of the query
      (2L, "completely different words entirely"),
      (3L, "")).toDF("doc_id", "text")
    val r = HashEmbed.cosineTopK(docs, "text", "doc_id", queryId = 0L, k = 5, dim = 16)
      .collect()
    assert(r.map(_.getLong(0)).toSeq.head == 1L)
    assert(math.abs(r.head.getAs[Double]("cosine") - 1.0) < 1e-12)
    assert(!r.map(_.getLong(0)).contains(3L)) // zero vector excluded
    assert(!r.map(_.getLong(0)).contains(0L)) // query excluded
    // integer evidence columns are exact: dot(twin) == n2(twin)
    assert(r.head.getAs[Long]("dot") == r.head.getAs[Long]("n2"))
  }
}
