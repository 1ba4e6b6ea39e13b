package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NearDup

class NearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearA = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
    val distinct1 = "completely different content about spark catalyst optimizer internals"
    val distinct2 = "yet another unrelated document discussing parquet column pruning"
    Seq(
      (0L, base), (1L, nearA), (2L, base), // 2 is exact dup of 0
      (3L, distinct1), (4L, distinct2)
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical canonical content") {
    val r = NearDup.exactDedup(corpus, "text", "doc_id").collect()
    assert(r.length == 4) // 5 docs, one exact pair
    val dupGroup = r.find(_.getAs[Long]("n_dups") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 0L)
  }

  test("exact jaccard pairs finds near + exact dups, not unrelated docs") {
    val pairs = NearDup.jaccardPairs(corpus, "text", "doc_id", n = 3, thresholdPct = 60)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 2L))) // exact dup: jaccard 1
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash-LSH candidates recover all high-similarity pairs (recall)") {
    val exact = NearDup.jaccardPairs(corpus, "text", "doc_id", n = 3, thresholdPct = 60)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = NearDup.minhashLshPairs(corpus, "text", "doc_id",
        n = 3, bands = 16, rowsPerBand = 4, thresholdPct = 60)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // at j>=0.6 with b=16,r=4 collision prob ≈ 1-(1-0.6^4)^16 ≈ 0.91;
    // on this tiny corpus every true pair must surface
    assert(exact.subsetOf(lsh))
    // and LSH output is exact-verified, so no false positives either
    assert(lsh.subsetOf(exact))
  }

  test("simhash bucket cap bounds a degenerate corpus of identical docs") {
    // 1k identical docs share every signature chunk: uncapped, the chunk
    // self-join emits ~4·10⁶ rows before dedup; the cap excludes over-full
    // buckets so the join completes with a bounded (here zero) candidate set
    val dupes = (0L until 1000L)
      .map(i => (i, "all these documents have exactly the same content"))
      .toDF("doc_id", "text")
    val capped = NearDup.simhashPairs(dupes, "text", "doc_id",
      maxHamming = 3, maxBucketSize = 100)
    assert(capped.count() == 0)
    // the default cap leaves normal corpora untouched (same rows as before)
    val normal = NearDup.simhashPairs(corpus, "text", "doc_id", maxHamming = 12)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(normal.contains((0L, 2L)))
  }

  test("jaccard frequency cutoff is finite by default; Exhaustive restores all-pairs") {
    // a shingle shared by every doc: with the finite default the docs'
    // OTHER (rare) shingles still generate the true near-dup candidates,
    // so results here are identical — but a corpus pairing ONLY through
    // ubiquitous shingles would stay bounded instead of exploding
    val deflt = NearDup.jaccardPairs(corpus, "text", "doc_id", n = 3, thresholdPct = 60)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val exh = NearDup.jaccardPairs(corpus, "text", "doc_id", n = 3, thresholdPct = 60,
        maxShingleFreq = NearDup.Exhaustive)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(deflt == exh)
    // cutoff=1 drops every shared shingle from the index -> no candidates
    val starved = NearDup.jaccardPairs(corpus, "text", "doc_id", n = 3,
      thresholdPct = 60, maxShingleFreq = 1)
    assert(starved.count() == 0)
  }

  test("prefix-filtered jaccard equals the exhaustive join on the shared corpus") {
    val exh = NearDup.jaccardPairs(corpus, "text", "doc_id", n = 3,
        thresholdPct = 60, maxShingleFreq = NearDup.Exhaustive)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3)))).toMap
    val pfx = NearDup.jaccardPairsPrefix(corpus, "text", "doc_id", n = 3,
        thresholdPct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3)))).toMap
    assert(pfx == exh && exh.nonEmpty)
  }

  test("prefix filter is lossless where the frequency cutoff loses pairs") {
    // high-jaccard pairs whose overlap is entirely SHARED shingles: a
    // cutoff of 1 keeps only df=1 shingles, dropping every shared one
    // from the index — the cutoff path finds nothing. The prefix path's
    // index keeps ALL shingles (ordering only decides which end up in
    // prefixes), so every true pair must still surface.
    val template = "please read the terms and conditions before you continue today"
    val docs = Seq(
      (0L, template),
      (1L, template + " ok"),
      (2L, "totally unrelated text about catalyst planner internals here"),
      (3L, "totally unrelated text about catalyst planner internals here"),
      (4L, "totally unrelated text about catalyst planner internals here"))
      .toDF("doc_id", "text")
    val cut = NearDup.jaccardPairs(docs, "text", "doc_id", n = 3,
        thresholdPct = 60, maxShingleFreq = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cut.isEmpty) // the cutoff heuristic lost every pair
    val pfx = NearDup.jaccardPairsPrefix(docs, "text", "doc_id", n = 3,
        thresholdPct = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pfx.contains((0L, 1L)))
    assert(pfx.contains((2L, 3L)) && pfx.contains((2L, 4L)) && pfx.contains((3L, 4L)))
    intercept[IllegalArgumentException](
      NearDup.jaccardPairsPrefix(docs, "text", "doc_id", thresholdPct = 0))
  }

  test("simhash: identical docs distance 0, near dups close, distinct far") {
    val pairs = NearDup.simhashPairs(corpus, "text", "doc_id", maxHamming = 12)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Number]("hamming").longValue).toMap
    assert(pairs((0L, 2L)) == 0L)
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((3L, 4L)))
  }

  test("portable md5 base hash matches the cross-engine definition") {
    // md5('abc') = 900150983cd24fb0... -> big-endian int64 of the first 8
    // bytes; the same value DuckDB reconstructs from the hex slices
    assert(graft.plans.PortableSketch.md5Long(
      "abc".getBytes(java.nio.charset.StandardCharsets.UTF_8)) ==
      java.lang.Long.parseUnsignedLong("900150983cd24fb0", 16))
    val viaSpark = corpus.limit(1)
      .select(graft.plans.SketchFunctions.portableHash64(
        org.apache.spark.sql.functions.array(
          org.apache.spark.sql.functions.lit("abc"))).as("h"))
      .head().getSeq[Long](0)
    assert(viaSpark == Seq(java.lang.Long.parseUnsignedLong("900150983cd24fb0", 16)))
  }

  test("portable sketch family: same pair semantics, reproducible values") {
    // minhash-LSH portable path recovers the same verified pair set as the
    // exhaustive exact join (recall on this tiny corpus must be total)
    val exact = NearDup.jaccardPairs(corpus, "text", "doc_id", n = 3, thresholdPct = 60)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val portable = NearDup.minhashLshPairs(corpus, "text", "doc_id",
        n = 3, bands = 16, rowsPerBand = 4, thresholdPct = 60,
        hash = NearDup.SketchHash.PortableMd5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(exact.subsetOf(portable) && portable.subsetOf(exact))
    // simhash portable path: exact dup at distance 0, unrelated docs absent
    val sim = NearDup.simhashPairs(corpus, "text", "doc_id", maxHamming = 12,
        hash = NearDup.SketchHash.PortableMd5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Number]("hamming").longValue).toMap
    assert(sim((0L, 2L)) == 0L)
    assert(!sim.contains((3L, 4L)))
  }

  test("simhashPairs excludes token-less docs instead of pairing their zero signatures") {
    val withEmpty = corpus.unionByName(
      Seq((50L, "   "), (51L, "")).toDF("doc_id", "text"))
    Seq(NearDup.SketchHash.Xx64, NearDup.SketchHash.PortableMd5).foreach { h =>
      val ids = NearDup.simhashPairs(withEmpty, "text", "doc_id", maxHamming = 12, hash = h)
        .collect().flatMap(r => Seq(r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(!ids.contains(50L) && !ids.contains(51L))
    }
  }

  test("contaminatedDocs flags only docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "clean document with totally unrelated words here"),
      (2L, "prefix junk alpha beta gamma delta epsilon tail"), // embeds one bench 5-gram
      (3L, "alpha beta gamma unrelated delta epsilon zeta")    // shares words, no 5-gram run
    ).toDF("doc_id", "text")
    val got = NearDup.contaminatedDocs(corpus, bench, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L))
  }

  test("sourceOverlapMatrix counts distinct shared fingerprints per source pair") {
    val docs = Seq(
      ("A", "shared one"), ("A", "shared two"), ("A", "only in a"),
      ("B", "shared one"), ("B", "shared two"), ("B", "shared one"), // dup row: still 1 fp
      ("C", "shared one"), ("C", "only in c")
    ).toDF("source", "text")
    val got = NearDup.sourceOverlapMatrix(docs, "text", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "B") -> 2L, ("A", "C") -> 1L, ("B", "C") -> 1L))
  }

  private def clusters(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    NearDup.dupClusters(edges.toDF("id_a", "id_b"), maxIter = maxIter)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap

  test("dupClusters: transitive chain collapses to one min-labeled component") {
    // A~B~C with NO direct A~C edge — the case plain pair-dedup gets wrong
    assert(clusters(Seq((10L, 20L), (20L, 30L))) ==
      Map(10L -> 10L, 20L -> 10L, 30L -> 10L))
  }

  test("dupClusters: separate components, cliques, and edge-order invariance") {
    val edges = Seq((5L, 6L), (6L, 7L), (5L, 7L), // clique {5,6,7}
      (100L, 90L), (90L, 95L))                    // chain {90,95,100}
    val expected = Map(5L -> 5L, 6L -> 5L, 7L -> 5L,
      90L -> 90L, 95L -> 90L, 100L -> 90L)
    assert(clusters(edges) == expected)
    assert(clusters(edges.reverse.map { case (a, b) => (b, a) }) == expected)
    assert(clusters(edges ++ edges) == expected) // duplicate edges harmless
  }

  test("dupClusters: long path converges (diameter rounds) and empty input is empty") {
    val path = (0L until 9L).map(i => (i, i + 1)) // diameter 9
    assert(clusters(path) == (0L to 9L).map(_ -> 0L).toMap)
    assert(clusters(Nil) == Map.empty)
  }

  private def minLabelClusters(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    NearDup.dupClusters(edges.toDF("id_a", "id_b"), maxIter = maxIter,
        algorithm = NearDup.CcAlgorithm.MinLabel)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap

  test("dupClusters: explicit MinLabel maxIter bound throws instead of mislabeling") {
    val path = (0L until 12L).map(i => (i, i + 1))
    intercept[IllegalStateException](minLabelClusters(path, maxIter = 2))
  }

  test("dupClusters: Auto switches to star contraction past the min-label budget") {
    // diameter 60 exceeds AutoSwitchRounds (and the explicit-MinLabel
    // bound), but the default algorithm must label it correctly without
    // raising — the auto-switch contract
    val chain = (0L until 60L).map(i => (i, i + 1))
    assert(clusters(chain, maxIter = 25) == (0L to 60L).map(_ -> 0L).toMap)
  }

  private def starClusters(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    NearDup.dupClusters(edges.toDF("id_a", "id_b"), maxIter = maxIter,
        algorithm = NearDup.CcAlgorithm.StarContraction)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap

  test("star contraction: O(log d) — a 60-deep chain converges where min-label's bound throws") {
    // a versioned-document chain longer than min-label's default round
    // bound: diameter 60 needs 60 min-label rounds (throws at 25), but
    // star contraction halves heights per round and lands well inside it
    val chain = (0L until 60L).map(i => (i, i + 1))
    intercept[IllegalStateException](minLabelClusters(chain, maxIter = 25))
    assert(starClusters(chain, maxIter = 25) == (0L to 60L).map(_ -> 0L).toMap)
  }

  test("star contraction matches min-label on random graphs, chains, cliques, self-loops") {
    val rnd = new scala.util.Random(4242)
    (1 to 4).foreach { trial =>
      val n = 30 + trial * 10
      val edges = Seq.fill(n) {
        (rnd.nextInt(n * 2).toLong, rnd.nextInt(n * 2).toLong) // incl. self-loops
      }
      val viaStar = starClusters(edges)
      val viaMin  = clusters(edges, maxIter = 1000)
      assert(viaStar == viaMin, s"trial $trial diverged")
    }
    // shapes with known answers
    assert(starClusters(Seq((10L, 20L), (20L, 30L))) ==
      Map(10L -> 10L, 20L -> 10L, 30L -> 10L))
    assert(starClusters(Seq((5L, 6L), (6L, 7L), (5L, 7L), (100L, 90L), (90L, 95L))) ==
      Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 90L -> 90L, 95L -> 90L, 100L -> 90L))
    assert(starClusters(Seq((9L, 9L))) == Map(9L -> 9L))
    assert(starClusters(Nil) == Map.empty)
  }

  test("incremental dedup: keeps only new content, first-in-batch wins") {
    val corpusDf = Seq(
      (1L, "existing document about rivers and banks"),
      (2L, "another existing document about optimizers")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Existing   DOCUMENT about rivers and banks"), // canonical dup of corpus 1
      (11L, "a genuinely new document about parquet"),
      (12L, "a genuinely new document about parquet"),     // within-batch dup of 11
      (13L, "a second new document about arrow")
    ).toDF("doc_id", "text")
    val kept = NearDup.incrementalDedup(batch, corpusDf, "text", "doc_id")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(11L, 13L))
  }

  test("incremental dedup against an empty corpus is plain within-batch dedup") {
    val batch = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val kept = NearDup.incrementalDedup(batch, empty, "text", "doc_id")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 3L))
  }

  test("incremental dedup against a stored fingerprint set ≡ against the corpus text") {
    import graft.functions.TextAnalysis
    import org.apache.spark.sql.functions.{col, lit}
    val corpusDf = Seq(
      (1L, "existing document about rivers and banks"),
      (2L, "another existing document about optimizers")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Existing   DOCUMENT about rivers and banks"), // dup via the STORE
      (11L, "a genuinely new document about parquet"),
      (12L, "a genuinely new document about parquet"),     // within-batch dup
      (13L, "a second new document about arrow")
    ).toDF("doc_id", "text")
    // the deployed shape: only 16-byte fingerprints persist, duplicated
    // rows in the state table are tolerated
    val storedFps = corpusDf
      .select(TextAnalysis.canonicalFingerprint(col("text")).as("fp"))
      .unionAll(corpusDf.select(TextAnalysis.canonicalFingerprint(col("text")).as("fp")))
    val viaStore = NearDup.incrementalDedupStored(batch, storedFps, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp"))).toSet
    val viaText = NearDup.incrementalDedup(batch, corpusDf, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("fp"))).toSet
    assert(viaStore == viaText)
    assert(viaStore.map(_._1) == Set(11L, 13L))
    // empty store: plain within-batch dedup
    val emptySeen = corpusDf.select(lit("").as("fp")).limit(0)
    assert(NearDup.incrementalDedupStored(batch, emptySeen, "text", "doc_id")
      .collect().map(_.getAs[Long]("doc_id")).toSet == Set(10L, 11L, 13L))
  }

  test("incremental dedup Bloom path matches the exact path (property)") {
    // randomized-but-seeded corpus/batch with engineered overlap: corpus
    // dups, within-batch dups, and fresh docs — the Bloom path must agree
    // with the exact path on every row (false positives re-checked, false
    // negatives impossible)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    def doc(): String = Seq.fill(3 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpusDocs = (1L to 200L).map(i => (i, doc()))
    val batchDocs = (1000L to 1120L).map { i =>
      val r = rnd.nextInt(10)
      val text =
        if (r < 3) corpusDocs(rnd.nextInt(corpusDocs.size))._2 // corpus dup
        else if (r < 5 && i > 1000L) s"batch dup marker ${i % 7}" // within-batch dup family
        else doc()
      (i, text)
    }
    val corpusDf = corpusDocs.toDF("doc_id", "text")
    val batchDf = batchDocs.toDF("doc_id", "text")
    val exact = NearDup.incrementalDedup(batchDf, corpusDf, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bloom = NearDup.incrementalDedupBloom(batchDf, corpusDf, "text", "doc_id",
        expectedFps = 300L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("incremental dedup Bloom path: tiny filter (forced false positives) still exact") {
    // undersized expectedFps drives the false-positive rate way up — the
    // exact re-check must still reject every false alarm
    val corpusDf = (1L to 50L).map(i => (i, s"corpus doc number $i")).toDF("doc_id", "text")
    val batchDf = (100L to 140L).map(i => (i, s"batch doc number $i")).toDF("doc_id", "text")
    val exact = NearDup.incrementalDedup(batchDf, corpusDf, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    val bloom = NearDup.incrementalDedupBloom(batchDf, corpusDf, "text", "doc_id",
        expectedFps = 2L, fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(bloom == exact)
    assert(bloom == (100L to 140L).toSet)
  }

  test("containment pairs: aligned excerpts found, equal text and short anchors excluded") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // token-aligned excerpt of 1 (tokens 3..6)
      (2L, "gamma delta epsilon zeta"),
      // exact same canonical text as 1 -> equal length, NOT reported
      (3L, "Alpha  Beta gamma delta epsilon zeta eta theta iota kappa"),
      // shares no trigram with anyone
      (4L, "one two three four five six"),
      // fewer than n tokens: no anchor, never a contained candidate
      (5L, "zeta eta")
    ).toDF("doc_id", "text")
    val pairs = NearDup.containmentPairs(docs, "text", "doc_id",
        n = 3, maxAnchorFreq = NearDup.Exhaustive)
      .collect()
      .map(r => (r.getAs[Long]("contained_id"), r.getAs[Long]("container_id"))).toSet
    assert(pairs == Set((2L, 1L), (2L, 3L)))
  }

  test("minhash accuracy audit: identical docs are error-free, estimates stay in bounds") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base), // identical -> jaccard 1, agreement k/k, err 0
      (3L, base + " lambda mu nu xi"), // high-overlap neighbor
      (4L, "one two three four five six seven") // disjoint: no pair
    ).toDF("doc_id", "text")
    val got = NearDup.minhashAccuracyAudit(docs, "text", "doc_id",
        n = 3, numHashes = 64, minJaccardPct = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        ((r.getAs[Long]("exact_pmyriad"), r.getAs[Long]("est_pmyriad"),
          r.getAs[Long]("err_pmyriad")))).toMap
    assert(got((1L, 2L)) == ((10000L, 10000L, 0L)))
    assert(!got.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // the (1,3)/(2,3) estimates must be within a loose 4-sigma of exact:
    // sigma = sqrt(j(1-j)/64) ~ 0.055 at j ~ 0.57 -> 2200 per-myriad
    val (ex13, _, err13) = got((1L, 3L))
    assert(ex13 > 4000L && ex13 < 9000L)
    assert(err13 <= 2200L, s"estimator err $err13 at exact $ex13")
    // audit is symmetric-complete on the slice: both neighbor pairs present
    assert(got.contains((2L, 3L)))
  }

  test("containment pairs: chars are canonical lengths and contained is strictly shorter") {
    val docs = Seq(
      (1L, "  a  b c d e  "),
      (2L, "b c d")
    ).toDF("doc_id", "text")
    val r = NearDup.containmentPairs(docs, "text", "doc_id", n = 3,
      maxAnchorFreq = NearDup.Exhaustive).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("contained_id") == 2L)
    assert(r.head.getAs[Int]("chars_a") == 5) // "b c d"
    assert(r.head.getAs[Int]("chars_b") == 9) // "a b c d e"
  }

  test("shared n-gram ladder: longest shared length per doc, zeros for loners") {
    // d1/d2 share "a b c" (one 3-gram) and its two 2-grams; d3 shares nothing
    val docs = Seq((1L, "a b c d e"), (2L, "x a b c y"), (3L, "q w e r t"))
      .toDF("doc_id", "text")
    val out = NearDup.sharedNgramLadder(docs, "doc_id", "text", Seq(2, 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 0L, 0L)))
    // repeated gram inside ONE doc does not make it shared
    val solo = Seq((1L, "p q p q"), (2L, "z z z")).toDF("doc_id", "text")
    val o2 = NearDup.sharedNgramLadder(solo, "doc_id", "text", Seq(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(o2 == Seq((1L, 0L), (2L, 0L)))
  }
}
