package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpanDedup

class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int) =
    SpanDedup.dupSpanCoverage(docs.toDF("doc_id", "text"), "text", "doc_id", n)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("shared run marks both docs; islands merge overlapping grams") {
    // A and B share the 4-token run c1..c4 -> two overlapping 3-grams
    // merging into ONE island of 4 covered tokens (A: [2,6), B: [1,5))
    val got = run(Seq(
      1L -> "x1 x2 c1 c2 c3 c4 y1",
      2L -> "z1 c1 c2 c3 c4 z2",
      3L -> "u1 u2 u3 u4 u5"), n = 3)
    assert(got(0) == ((1L, 7L, 2L, 4L, 571L))) // 4*1000 DIV 7
    assert(got(1) == ((2L, 6L, 2L, 4L, 666L)))
    assert(got(2) == ((3L, 5L, 0L, 0L, 0L)))
  }

  test("disjoint shared spans stay separate islands; within-doc-only repeats don't count") {
    val got = run(Seq(
      1L -> "x1 x2 c1 c2 c3 c4 y1",
      // doc 4: the shared gram (c1 c2 c3) at pos 0 AND pos 7 — two
      // disjoint islands of 3 tokens each
      4L -> "c1 c2 c3 m1 m2 m3 m4 c1 c2 c3",
      // doc 5: an internal repeat no OTHER doc has — cross-doc rule
      // must NOT flag it (intra-doc repetition is q59's job)
      5L -> "r1 r2 r3 r1 r2 r3"), n = 3)
    val d4 = got.find(_._1 == 4L).get
    assert(d4 == ((4L, 10L, 2L, 6L, 600L)))
    val d5 = got.find(_._1 == 5L).get
    assert(d5 == ((5L, 6L, 0L, 0L, 0L)))
  }

  test("exact duplicate docs are fully covered; short docs yield no grams") {
    val text = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val got = run(Seq(1L -> text, 2L -> text, 3L -> "a b"), n = 8)
    assert(got(0) == ((1L, 9L, 2L, 9L, 1000L)))
    assert(got(1) == ((2L, 9L, 2L, 9L, 1000L)))
    assert(got(2) == ((3L, 2L, 0L, 0L, 0L)))
  }

  test("agrees with a brute-force reference on a pseudo-random corpus") {
    // 40 docs over a 12-word vocab, lengths 5..16 — dense natural
    // cross-doc 3-gram collisions, no RNG APIs (index-derived values)
    val docs: Seq[(Long, String)] = (0L until 40L).map { d =>
      val len = (d * 2654435761L % 12L + 5L).toInt
      val words = (0 until len).map(i => s"w${(d * 40503L + i * 8191L + i * i) % 12L}")
      d -> words.mkString(" ")
    }
    val n = 3
    val tok: Map[Long, Vector[String]] =
      docs.map { case (id, t) => id -> t.split("\\s+").toVector }.toMap
    val grams: Map[Long, Vector[(Int, Vector[String])]] = tok.map { case (id, ws) =>
      id -> (0 to ws.length - n).toVector.map(p => p -> ws.slice(p, p + n))
    }
    val dupSet = grams.toSeq.flatMap { case (id, gs) => gs.map(g => (g._2, id)) }
      .distinct.groupBy(_._1).filter(_._2.size >= 2).keySet
    val expected = tok.map { case (id, ws) =>
      val hits = grams(id).filter(g => dupSet(g._2)).map(_._1)
      val covered = hits.foldLeft(Vector.empty[(Int, Int)]) { case (acc, p) =>
        acc.lastOption match {
          case Some((s, e)) if p < e => acc.init :+ (s, math.max(e, p + n))
          case _                     => acc :+ (p, p + n)
        }
      }.map { case (s, e) => e - s }.sum
      id -> (ws.length.toLong, hits.size.toLong, covered.toLong)
    }
    val got = run(docs, n)
    assert(got.length == 40)
    got.foreach { case (id, nt, ndg, cov, pml) =>
      val (en, eh, ec) = expected(id)
      assert((nt, ndg, cov) == ((en, eh, ec)), s"doc $id")
      assert(pml == (if (en > 0) cov * 1000 / en else 0L))
    }
  }

  test("incremental: batch scored against corpus grams only; batch-internal dups don't count") {
    val corpus = Seq(1L -> "c1 c2 c3 c4 x1 x2").toDF("doc_id", "text")
    val batch = Seq(
      10L -> "a1 c1 c2 c3 c4 a2", // corpus run [1,5) -> 4 covered
      11L -> "b1 b2 b3 b4 b5",    // nothing from corpus
      12L -> "b1 b2 b3 b4 b5"     // exact dup of 11 — but only WITHIN the batch -> 0
    ).toDF("doc_id", "text")
    val got = graft.operators.SpanDedup
      .incrementalSpanCoverage(batch, corpus, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq(
      (10L, 6L, 2L, 4L, 666L),
      (11L, 5L, 0L, 0L, 0L),
      (12L, 5L, 0L, 0L, 0L)))
  }

  test("coverage never exceeds n_tokens and adjacency chains into one island") {
    // shared 6-token run with n=3: grams at pos 1,2,3,4 chain into one
    // island [1, 7) -> 6 covered
    val got = run(Seq(
      1L -> "p0 s1 s2 s3 s4 s5 s6 q0",
      2L -> "s1 s2 s3 s4 s5 s6"), n = 3)
    assert(got(0)._4 == 6L && got(0)._4 <= got(0)._2)
    assert(got(1) == ((2L, 6L, 4L, 6L, 1000L)))
  }
}
