package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16
  private val rnd = new scala.util.Random(7)
  private def vec(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)

  private val base = {
    val rows = (0L until 200L).map(i => (i, vec()))
    rows.toDF("vec_id", "embedding")
  }

  test("brute-force top-k is exact and deterministic") {
    val q = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val top = Similarity.bruteForceTopK(base.filter($"vec_id" =!= 0), "embedding", "vec_id", q, 5)
      .collect()
    assert(top.length == 5)
    // scores strictly ordered desc
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // rerun identical
    val top2 = Similarity.bruteForceTopK(base.filter($"vec_id" =!= 0), "embedding", "vec_id", q, 5)
      .collect()
    assert(top.map(_.toString).toSeq == top2.map(_.toString).toSeq)
  }

  test("LSH ANN recovers planted near-neighbors with high recall") {
    // plant 10 jittered copies of vec 0: the genuinely-similar neighborhood
    // an ANN index exists to find (random points have no structure to hash)
    val q0 = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val jit = new scala.util.Random(13)
    val planted = (1000L until 1010L).map { i =>
      (i, q0.map(x => x + jit.nextGaussian().toFloat * 0.05f))
    }.toDF("vec_id", "embedding")
    val all = base.union(planted)
    val q = q0.map(_.toDouble).toSeq
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 6)
    val exact = Similarity.bruteForceTopK(all.filter($"vec_id" =!= 0), "embedding", "vec_id", q, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(exact.forall(_ >= 1000L)) // sanity: planted vectors are the true top-10
    val ann = Similarity.annTopK(all.filter($"vec_id" =!= 0), "embedding", "vec_id", q, 10, lsh)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall too low")
  }

  test("materialized ANN index: bit-identical to annTopK, plan prunes to probe buckets") {
    val q = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val corpus = base.filter($"vec_id" =!= 0)
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 6)
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-idx").toString
    Similarity.buildAnnIndex(corpus, "embedding", "vec_id", lsh, idx)

    val indexed = Similarity.annTopKIndexed(spark, idx, "embedding", "vec_id", q, 5, lsh)
    val perQuery = Similarity.annTopK(corpus, "embedding", "vec_id", q, 5, lsh)
    assert(indexed.collect().map(_.toString).toSeq ==
      perQuery.collect().map(_.toString).toSeq)

    // partition pruning: the scan carries the probe set as a partition
    // filter and selects at most bits+1 of the bucket directories
    val scan = indexed.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("bucket"))
    val bucketDirs = new java.io.File(idx).listFiles()
      .count(_.getName.startsWith("bucket="))
    val selected = scan.selectedPartitions.partitionCount
    assert(selected <= lsh.bits + 1,
      s"scan selected $selected partitions; expected <= ${lsh.bits + 1} of $bucketDirs")
    assert(selected < bucketDirs, "pruning did not reduce the scanned directories")
  }

  test("ensureAnnIndex builds once, reuses a complete index, replaces a stale one") {
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 6)
    val root = java.nio.file.Files.createTempDirectory("graft-ann-ensure")
    val idx = root.resolve("index").toString
    Similarity.ensureAnnIndex(base, "embedding", "vec_id", lsh, idx)
    assert(new java.io.File(idx, "_GRAFT_INDEX_COMPLETE").exists())
    def listing(): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(idx)).map(f => (f.getPath, f.length, f.lastModified)).toSet
    }
    val before = listing()
    Similarity.ensureAnnIndex(base, "embedding", "vec_id", lsh, idx)
    assert(listing() == before, "a complete index was rebuilt instead of reused")
    // a stale half-written tree (no completion marker) is replaced, not
    // trusted — the marker is catalog-owned, so this holds even where the
    // committer's _SUCCESS is disabled
    assert(new java.io.File(idx, "_GRAFT_INDEX_COMPLETE").delete())
    Similarity.ensureAnnIndex(base, "embedding", "vec_id", lsh, idx)
    assert(new java.io.File(idx, "_GRAFT_INDEX_COMPLETE").exists())
    assert(listing() != before, "a stale incomplete index was not rebuilt")
    // probing the ensured index matches the per-query form
    val q = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val viaIndex = Similarity.annTopKIndexed(spark, idx, "embedding", "vec_id",
      q, 5, lsh, keep = $"vec_id" =!= 0)
    val direct = Similarity.annTopK(base.filter($"vec_id" =!= 0), "embedding", "vec_id", q, 5, lsh)
    assert(viaIndex.collect().map(_.toString).toSeq == direct.collect().map(_.toString).toSeq)
  }

  test("annJoinIndexed matches annJoin over the same corpus and planes") {
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 4)
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-join-idx").toString
    Similarity.buildAnnIndex(base, "embedding", "vec_id", lsh, idx)
    val queries = base.filter($"vec_id" < 5)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val direct  = Similarity.annJoin(queries, base, "embedding", "vec_id", 3, lsh)
    val indexed = Similarity.annJoinIndexed(spark, idx, queries, "embedding", "vec_id", 3, lsh)
    assert(canon(indexed) == canon(direct))
    assert(canon(indexed).nonEmpty)
    // every query's rank-1 hit is its own base copy (identical vector)
    val r1 = indexed.filter($"rank" === 1).collect()
    assert(r1.forall(_.getAs[Double]("score") >= 1.0 - 1e-9))
  }

  test("annJoin returns k ranked neighbors per query") {
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 4)
    val queries = base.filter($"vec_id" < 5)
    val out = Similarity.annJoin(queries, base, "embedding", "vec_id", 3, lsh)
    val got = out.groupBy("query_id").agg(count(lit(1)).as("n")).collect()
    assert(got.forall(_.getAs[Long]("n") <= 3))
    assert(out.filter($"rank" === 1).count() <= 5)
    // self-matches excluded
    assert(out.filter($"query_id" === $"base_id").isEmpty)
  }

  test("annJoin bucket cap bounds a degenerate corpus of identical vectors") {
    // 1000 identical base embeddings all land in ONE bucket; the cap must
    // keep the join from emitting |queries| x 1000 rows
    val vec = Array.fill(8)(1.0f)
    val degenerate = (0L until 1000L).map(i => (i, vec)).toDF("vec_id", "embedding")
    val lsh = Similarity.HyperplaneLsh(dim = 8, bits = 4)
    val queries = degenerate.filter($"vec_id" < 3)
    val capped = Similarity.annJoin(queries, degenerate, "embedding", "vec_id",
      k = 2, lsh, maxBucketSize = 100)
    // over-cap bucket is unreachable -> no results, but the job completes
    // with a bounded join instead of a 3000-row blowup per bucket
    assert(capped.count() == 0)
    val uncapped = Similarity.annJoin(queries, degenerate, "embedding", "vec_id",
      k = 2, lsh)
    assert(uncapped.groupBy("query_id").count().collect().forall(_.getLong(1) <= 2))
  }

  test("IVF index: training converges, probes find planted neighbors") {
    val q0 = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val jit = new scala.util.Random(17)
    val planted = (2000L until 2010L).map { i =>
      (i, q0.map(x => x + jit.nextGaussian().toFloat * 0.05f))
    }.toDF("vec_id", "embedding")
    val all = base.union(planted)
    val idx = Similarity.IvfIndex.train(all, "embedding", k = 8, sampleSize = 300)
    assert(idx.centroids.length == 8)
    val q = q0.map(_.toDouble).toSeq
    val exact = Similarity.bruteForceTopK(all.filter($"vec_id" =!= 0), "embedding", "vec_id", q, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = Similarity.ivfTopK(all.filter($"vec_id" =!= 0), "embedding", "vec_id", q, 10, idx, nprobe = 3)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall too low")
  }

  test("IVF training is sample-based: sorted/clustered corpus still gets spread centroids") {
    // two well-separated clusters, SORTED so the first partitions hold
    // cluster A only — limit(n)-training would place every centroid in A
    // and recall for a cluster-B query collapses; uniform takeSample must
    // see both clusters
    val rndS = new scala.util.Random(23)
    val clusterA = (0L until 600L).map { i =>
      (i, Array.fill(dim)(5f + rndS.nextGaussian().toFloat * 0.1f))
    }
    val clusterB = (600L until 1200L).map { i =>
      (i, Array.fill(dim)(-5f + rndS.nextGaussian().toFloat * 0.1f))
    }
    // repartition(1) + sortWithinPartitions pins physical scan order: A first
    val sorted = (clusterA ++ clusterB).toDF("vec_id", "embedding")
      .repartition(1).sortWithinPartitions("vec_id")
    val idx = Similarity.IvfIndex.train(sorted, "embedding", k = 4, sampleSize = 100)
    // at least one centroid must live in each cluster's halfspace
    assert(idx.centroids.exists(_.head > 1.0), "no centroid near cluster A")
    assert(idx.centroids.exists(_.head < -1.0),
      "no centroid near cluster B — training sample was not uniform")
    // and a query in cluster B achieves exact recall through the index
    val q = Seq.fill(dim)(-5.0)
    val exact = Similarity.bruteForceTopK(sorted, "embedding", "vec_id", q, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = Similarity.ivfTopK(sorted, "embedding", "vec_id", q, 10, idx, nprobe = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert((exact & ivf).size.toDouble / exact.size >= 0.8)
  }

  test("int8 quantization: clamped range, high top-k agreement with float scoring") {
    val q = Similarity.quantizeEmbedding($"embedding")
    val vals = base.select(q.as("q")).collect().flatMap(_.getSeq[Int](0))
    assert(vals.forall(v => v >= -127 && v <= 127))
    // clamp engages on out-of-range inputs; degenerate elements are
    // defined under ANSI, not fatal: NaN -> 0, +/-Inf and huge -> +/-127
    val big = Seq((1L, Array(10.0f, -10.0f))).toDF("vec_id", "embedding")
    assert(big.select(q.as("q")).head().getSeq[Int](0) == Seq(127, -127))
    val weird = Seq((1L, Array(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, 1e9f, 0.004f))).toDF("vec_id", "embedding")
    assert(weird.select(q.as("q")).head().getSeq[Int](0) ==
      Seq(0, 127, -127, 127, 0))
    // quantized integer ranking tracks the float ranking closely on
    // planted near-neighbors (the q61 readout)
    val q0 = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val jit = new scala.util.Random(31)
    val planted = (3000L until 3010L).map { i =>
      (i, q0.map(x => x + jit.nextGaussian().toFloat * 0.05f))
    }.toDF("vec_id", "embedding")
    val all = base.union(planted).filter($"vec_id" =!= 0)
    val qq = Seq((0L, q0)).toDF("vec_id", "embedding")
      .select(Similarity.quantizeEmbedding($"embedding").as("q"))
      .head().getSeq[Int](0).map(_.toDouble)
    val topQ = all.select($"vec_id",
        Similarity.dot(Similarity.quantizeEmbedding($"embedding").cast("array<double>"),
          array(qq.map(lit): _*)).as("s"))
      .orderBy($"s".desc, $"vec_id".asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val topF = Similarity.bruteForceTopK(all, "embedding", "vec_id",
        q0.map(_.toDouble), 10)
      .collect().map(_.getLong(0)).toSet
    assert((topQ & topF).size >= 8, s"quantized/float overlap too low: ${(topQ & topF).size}")
  }

  test("recommendedBits scales with corpus size and clamps") {
    assert(Similarity.recommendedBits(10000, 200) == 6)
    assert(Similarity.recommendedBits(1000000, 200) == 13)
    assert(Similarity.recommendedBits(1000000000L, 200) == 23)
    assert(Similarity.recommendedBits(10, 200) == 4)   // clamp low
    assert(Similarity.recommendedBits(Long.MaxValue / 2, 1) == 62) // clamp high
    // candidate volume sanity: n²/2^bits ≈ n·targetBucketSize
    val n = 1000000L
    val bits = Similarity.recommendedBits(n, 200)
    val perBucket = n.toDouble / math.pow(2, bits)
    assert(perBucket <= 200.0 && perBucket > 50.0)
  }

  test("cosineDupPairs bucket cap bounds a degenerate corpus") {
    // 500 identical embeddings all hash to ONE bucket; cap 50 excludes the
    // bucket from the index side so the join stays bounded (and empty)
    val same = Array.fill(dim)(1.0f)
    val dupes = (0L until 500L).map(i => (i, same)).toDF("vec_id", "embedding")
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 6)
    val capped = Similarity.cosineDupPairs(dupes, "embedding", "vec_id", 0.9, lsh,
      maxBucketSize = 50)
    assert(capped.count() == 0)
    // default cap leaves normal corpora untouched
    val normalPairs = Similarity.cosineDupPairs(
      base.union(base.filter($"vec_id" === 7).select(lit(9999L).as("vec_id"), col("embedding"))),
      "embedding", "vec_id", 0.99, lsh)
    assert(normalPairs.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .contains((7L, 9999L)))
  }

  test("adaptiveBits: integer rule matches the log form and bounds") {
    // smallest b in [4,16] with 200·2^b >= n
    assert(Similarity.adaptiveBits(1L) == 4)
    assert(Similarity.adaptiveBits(3200L) == 4)      // boundary tie -> low side
    assert(Similarity.adaptiveBits(3201L) == 5)
    assert(Similarity.adaptiveBits(10000L) == Similarity.recommendedBits(10000L))
    assert(Similarity.adaptiveBits(1000000L) == Similarity.recommendedBits(1000000L))
    assert(Similarity.adaptiveBits(200L * (1L << 16)) == 16)
    assert(Similarity.adaptiveBits(Long.MaxValue / 4) == 16) // maxBits fallback
    assert(Similarity.adaptiveBits(1L << 40, maxBits = 62) == 33)
  }

  test("plane-prefix property: a wide signature masked to b bits IS the b-bit signature") {
    val wide = Similarity.HyperplaneLsh(dim = dim, bits = 16)
    val narrow = Similarity.HyperplaneLsh(dim = dim, bits = 5)
    assert(wide.planes.take(5) == narrow.planes)
    val v = (0 until dim).map(i => math.sin(i * 1.7) * (if (i % 3 == 0) -1 else 1))
    assert((wide.signatureOf(v) & 0x1FL) == narrow.signatureOf(v))
  }

  test("cosineDupPairs radius-0 keeps planted identical duplicates at any width") {
    val planted = base.union(
      base.filter($"vec_id" === 7)
        .select(lit(9999L).as("vec_id"), col("embedding")))
    for (bits <- Seq(4, 9, 14)) {
      val pairs = Similarity.cosineDupPairs(planted, "embedding", "vec_id", 0.99,
          Similarity.HyperplaneLsh(dim = dim, bits = bits), probeRadius = 0)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(pairs.contains((7L, 9999L)), s"planted pair lost at bits=$bits")
    }
    // radius-0 pair set is a subset of the radius-1 set (same geometry)
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 6)
    def pairSet(r: Int) =
      Similarity.cosineDupPairs(planted, "embedding", "vec_id", 0.5, lsh, probeRadius = r)
        .collect().map(x => (x.getAs[Long]("id_a"), x.getAs[Long]("id_b"))).toSet
    assert(pairSet(0).subsetOf(pairSet(1)))
  }

  test("cosineDupPairs finds planted near-duplicate") {
    val planted = base.union(
      base.filter($"vec_id" === 7)
        .select(lit(9999L).as("vec_id"), col("embedding")))
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 6)
    val pairs = Similarity.cosineDupPairs(planted, "embedding", "vec_id", 0.99, lsh)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((7L, 9999L)))
  }

  test("projected re-rank recovers the exact top-k with a generous prefilter") {
    val q = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val rest = base.filter($"vec_id" =!= 0)
    val proj = Similarity.RandomProjection(dimIn = dim, dimOut = 8)
    val two = Similarity.projectedRerankTopK(rest, "embedding", "vec_id", q, k = 5, proj,
        prefilter = 199) // prefilter = whole corpus: stage 2 must equal brute force
      .collect()
    val brute = Similarity.bruteForceTopK(rest, "embedding", "vec_id", q, 5).collect()
    assert(two.map(_.getAs[Long]("id")).toSeq == brute.map(_.getAs[Long]("vec_id")).toSeq)
    assert(two.map(_.getAs[Double]("score")).toSeq == brute.map(_.getAs[Double]("score")).toSeq)
  }

  test("projected re-rank with tight prefilter keeps good recall on planted neighbors") {
    val q0 = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val jit = new scala.util.Random(29)
    val planted = (2000L until 2005L).map { i =>
      (i, q0.map(x => x + jit.nextGaussian().toFloat * 0.05f))
    }.toDF("vec_id", "embedding")
    val all = base.filter($"vec_id" =!= 0).union(planted)
    val proj = Similarity.RandomProjection(dimIn = dim, dimOut = 8)
    val got = Similarity.projectedRerankTopK(all, "embedding", "vec_id",
        q0.map(_.toDouble).toSeq, k = 5, proj, prefilter = 20)
      .collect().map(_.getAs[Long]("id")).toSet
    // near-copies of the query survive an 8-dim angular prefilter
    assert((got & (2000L until 2005L).toSet).size >= 4,
      s"planted neighbors should dominate the top-5, got $got")
  }

  test("triplet mining: positive is nearest, negative is farthest in-neighborhood") {
    val q0 = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val jit = new scala.util.Random(31)
    // plant a tight positive next to anchor 0; the negative must come from
    // whatever else its probed buckets contain
    val planted = Seq((3000L, q0.map(x => x + jit.nextGaussian().toFloat * 0.02f)))
      .toDF("vec_id", "embedding")
    val all = base.union(planted)
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 4)
    val rows = Similarity.mineTriplets(
        all.filter($"vec_id" === 0), all, "embedding", "vec_id", lsh)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("pos_id") == 3000L, "planted near-copy must be the positive")
    assert(r.getAs[Double]("pos_score") > r.getAs[Double]("neg_score"))
    assert(r.getAs[Double]("margin") ==
      r.getAs[Double]("pos_score") - r.getAs[Double]("neg_score"))
    assert(r.getAs[Long]("neg_id") != 0L && r.getAs[Long]("neg_id") != 3000L)
  }

  test("triplet mining: single-candidate anchors yield no triplet") {
    // two orthogonal-ish vectors alone: each anchor sees at most one candidate
    val tiny = Seq(
      (0L, Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)),
      (1L, Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.001f))
    ).toDF("vec_id", "embedding")
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 4)
    val rows = Similarity.mineTriplets(tiny, tiny, "embedding", "vec_id", lsh).collect()
    assert(rows.isEmpty, s"no pair of distinct roles exists, got ${rows.mkString}")
  }

  test("semantic decontamination flags planted benchmark near-copies only") {
    val bench = base.filter($"vec_id" < 3)
    val jit = new scala.util.Random(17)
    val planted = bench.collect().map { r =>
      (r.getLong(0) + 5000L,
        r.getSeq[Float](1).toArray.map(x => x + jit.nextGaussian().toFloat * 0.01f))
    }.toSeq.toDF("vec_id", "embedding")
    val corpus = base.filter($"vec_id" >= 3).union(planted)
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 4)
    val flagged = Similarity.semanticDecontaminate(
        corpus, bench, "embedding", "vec_id", lsh, minCosine = 0.9)
      .collect()
    assert(flagged.map(_.getAs[Long]("vec_id")).sorted.toSeq == Seq(5000L, 5001L, 5002L),
      s"exactly the planted copies must be flagged, got ${flagged.mkString}")
    flagged.foreach { r =>
      assert(r.getAs[Long]("bench_id") == r.getAs[Long]("vec_id") - 5000L,
        "closest hit must be the planted source")
      assert(r.getAs[Double]("sim") > 0.99)
    }
  }

  test("incremental signature index: union-grown store serves identically to an all-at-once build") {
    import graft.sink.SnapshotSink
    val lsh = Similarity.HyperplaneLsh(dim = dim, bits = 4)
    val q = base.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val root = java.nio.file.Files.createTempDirectory("ann_incr").toString
    val initial = base.filter($"vec_id" % 5 =!= 1)
    val batch = base.filter($"vec_id" % 5 === 1)
    SnapshotSink.commit(Similarity.clusterForBucketPruning(
      Similarity.signatureTable(initial, "embedding", "vec_id", lsh), 2), root)
    // add-files append: only the batch is signed and written
    SnapshotSink.append(Similarity.clusterForBucketPruning(
      Similarity.signatureTable(batch, "embedding", "vec_id", lsh), 1), root)
    // stored rows ≡ signing the whole corpus at once
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(SnapshotSink.read(spark, root)) ==
      rows(Similarity.signatureTable(base, "embedding", "vec_id", lsh)))
    // serving from the grown store ≡ the direct LSH scan, and the
    // appended batch's vectors are reachable
    def served(df: org.apache.spark.sql.DataFrame) =
      Similarity.annTopKFromSignatures(df, "embedding", "vec_id", q, 8, lsh,
          keep = col("vec_id") =!= 0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val fromStore = served(SnapshotSink.read(spark, root))
    assert(fromStore == served(Similarity.signatureTable(base, "embedding", "vec_id", lsh)))
    val direct = Similarity.annTopK(base.filter($"vec_id" =!= 0),
        "embedding", "vec_id", q, 8, lsh)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromStore == direct)
  }

  test("projection column and driver-side projection agree") {
    val v = base.filter($"vec_id" === 3).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val proj = Similarity.RandomProjection(dimIn = dim, dimOut = 8)
    val fromCol = base.filter($"vec_id" === 3)
      .select(proj.project(col("embedding")).as("r"))
      .head().getSeq[Double](0).toIndexedSeq
    assert(fromCol == proj.projectOf(v))
  }

  test("quantization-error census hand frame: exact micro errors, saturation counter, NaN pin") {
    import org.apache.spark.sql.functions.col
    // label 0: x = 0.25 -> r=16, em = 250000 - 16*15625 = 0 (exact grid)
    //          x = 0.26 -> r = round(16.64) = 17, xm = 260000,
    //                      em = 260000 - 265625 = -5625
    // label 1: x = 3.0  -> r = 192 SATURATES to 127,
    //                      em = 3000000 - 1984375 = 1015625
    //          x = NaN  -> pins to 0: r=0, xm=0, em=0
    val df = Seq(
      (0, Seq(0.25f, 0.26f)),
      (1, Seq(3.0f, Float.NaN)))
      .toDF("label", "embedding")
    val got = graft.operators.Similarity
      .quantizationErrorCensus(df, "label", "embedding")
      .collect().map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_elems"), r.getAs[Long]("sat_pm"),
          r.getAs[Long]("mse_u2"), r.getAs[Long]("max_abs_e_micro")))).toMap
    // label 0: mse = (0 + 5625^2)/2 = 15820312 (truncated)
    assert(got(0) == ((2L, 0L, 15820312L, 5625L)))
    // label 1: 1 of 2 saturated -> 5000 pm; mse = 1015625^2 / 2
    assert(got(1) == ((2L, 5000L, 515747070312L, 1015625L)))
  }

  test("quantization-error census rejects a non-integral micro step") {
    import org.apache.spark.sql.functions.col
    val df = Seq((0, Seq(0.1f))).toDF("label", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.quantizationErrorCensus(
        df, "label", "embedding", scale = 48)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("probeBucketsR generates the exact Hamming ball at each radius") {
    val lsh = Similarity.HyperplaneLsh(dim = 4, bits = 6)
    val sig = 0x2AL // 101010
    def ball(r: Int) = spark.range(1)
      .select(lsh.probeBucketsR(lit(sig), r).as("b"))
      .head().getSeq[Long](0).toSet
    assert(ball(0) == Set(sig))
    assert(ball(1).size == 7)
    assert(ball(2).size == 1 + 6 + 15)
    val want2 = (0L until 64L).filter(s =>
      java.lang.Long.bitCount(s ^ sig) <= 2).toSet
    assert(ball(2) == want2)
    intercept[IllegalArgumentException] {
      lsh.probeBucketsR(lit(sig), 3)
    }
  }
}
