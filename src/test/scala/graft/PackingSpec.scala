package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packCensus hand frame: offsets, fragmentation, oversize, tail pad") {
    // t = [3,4,2,5,1] in id order -> offsets [0,3,7,9,14], total 15.
    // budget 4: seq cuts at 4/8/12 -> docs 2,3,4 straddle a cut; doc 4
    // (t=5 > 4) is oversize; 4 sequences, last padded by 1.
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 5L), (5L, 1L))
      .toDF("doc_id", "t")
    val r = Packing.packCensus(docs, "doc_id", "t", Seq(4L)).collect().head
    assert(r.getAs[Long]("n_docs") == 5L)
    assert(r.getAs[Long]("n_tokens") == 15L)
    assert(r.getAs[Long]("n_seqs") == 4L)
    assert(r.getAs[Long]("frag_docs") == 3L)
    assert(r.getAs[Long]("frag_pm") == 6000L)
    assert(r.getAs[Long]("oversize_docs") == 1L)
    assert(r.getAs[Long]("tail_pad") == 1L)
  }

  test("packCensus: zero-token docs count but never fragment; big budget never fragments") {
    val docs = Seq((1L, 0L), (2L, 7L), (3L, 0L), (4L, 7L)).toDF("doc_id", "t")
    val rows = Packing.packCensus(docs, "doc_id", "t", Seq(3L, 100L))
      .collect().map(r => r.getAs[Long]("budget") ->
        ((r.getAs[Long]("frag_docs"), r.getAs[Long]("frag_pm"),
          r.getAs[Long]("n_seqs")))).toMap
    // budget 3: doc2 (o=0,t=7) spans seqs 0..2, doc4 (o=7,t=7) spans
    // 2..4 -> both fragment; frag_pm over the 2 NONEMPTY docs = 10000
    assert(rows(3L) == ((2L, 10000L, 5L)))
    assert(rows(100L) == ((0L, 0L, 1L)))
  }

  test("packCensus fragmentation matches a brute-force replay across budgets") {
    val rnd = new scala.util.Random(7)
    val ts = Seq.fill(200)(rnd.nextInt(40).toLong)
    val docs = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "t")
    val budgets = Seq(8L, 32L, 128L)
    val got = Packing.packCensus(docs, "doc_id", "t", budgets)
      .collect().map(r => r.getAs[Long]("budget") ->
        ((r.getAs[Long]("frag_docs"), r.getAs[Long]("n_seqs"),
          r.getAs[Long]("tail_pad")))).toMap
    val offs = ts.scanLeft(0L)(_ + _)
    budgets.foreach { b =>
      val frag = ts.zip(offs).count { case (t, o) =>
        t > 0 && o / b != (o + t - 1) / b }
      val total = ts.sum
      val seqs = (total + b - 1) / b
      assert(got(b) == ((frag.toLong, seqs, seqs * b - total)), s"budget $b")
    }
  }

  test("chunkCensus hand frame: sliding-window counts and overlap re-reads") {
    // t=10 at (4,1): stride 3 -> chunks [0,4)[3,7)[6,10), reads 12 =
    // t + (nc-1)*overlap; t=4 -> one chunk; t=0 -> none.
    val docs = Seq(10L, 4L, 0L).toDF("t")
    val r = Packing.chunkCensus(docs, "t", Seq((4L, 1L))).collect().head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_tokens") == 14L)
    assert(r.getAs[Long]("n_chunks") == 4L)
    assert(r.getAs[Long]("tokens_read") == 16L) // 12 + 4 + 0
    assert(r.getAs[Long]("expansion_pm") == 10000L * 16L / 14L)
    assert(r.getAs[Long]("single_chunk_docs") == 1L)
  }

  test("chunkCensus: zero overlap reads each token once; configs sweep one cached scan") {
    val docs = Seq(10L, 4L, 25L).toDF("t")
    val rows = Packing.chunkCensus(docs, "t", Seq((4L, 0L), (4L, 2L)))
      .collect().map(r => (r.getAs[Long]("chunk_size"),
        r.getAs[Long]("overlap")) ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("tokens_read"),
          r.getAs[Long]("expansion_pm")))).toMap
    // (4,0): ceil(10/4)+1+ceil(25/4) = 3+1+7 = 11 chunks, zero re-reads
    assert(rows((4L, 0L)) == ((11L, 39L, 10000L)))
    // (4,2): stride 2 -> nc = 1+ceil((t-4)/2): 4, 1, 12 -> 17 chunks;
    // reads = t + (nc-1)*2 = 16 + 4 + 47 = 67
    assert(rows((4L, 2L)) == ((17L, 67L, 10000L * 67L / 39L)))
  }

  test("chunkCensus guards: overlap must be smaller than size") {
    val docs = Seq(10L).toDF("t")
    intercept[IllegalArgumentException](
      Packing.chunkCensus(docs, "t", Seq((4L, 4L))))
    intercept[IllegalArgumentException](
      Packing.chunkCensus(docs, "t", Seq.empty))
  }
}
