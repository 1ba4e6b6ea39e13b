package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("fixture carries binary payload + typed metadata") {
    val items = Multimodal.fixtureFromDocuments(spark, docs)
    val r = items.head()
    assert(Set("image", "audio", "video").contains(r.kind))
    assert(r.content.nonEmpty)
    assert(items.count() == 500)
  }

  test("feature extraction is deterministic, fixed-dim, per-partition batched") {
    val items = Multimodal.fixtureFromDocuments(spark, docs).repartition(4)
    val f1 = Multimodal.extractFeatures(items).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(items).collect().sortBy(_.media_id)
    assert(f1.length == 500)
    assert(f1.forall(_.feature.length == Multimodal.FeatureDim))
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
  }

  test("stub embedding wraps the portable integer heads; stubUnits replays them through mapPartitions") {
    val content = "some payload text".getBytes("UTF-8")
    // the float stub IS the scaled integer head — one arithmetic, two views
    val f = Multimodal.Codecs.decodeToFeature(content)
    (0 until Multimodal.FeatureDim).foreach { i =>
      val u = Multimodal.Codecs.stubFeatureUnit(content, i)
      assert(f(i) == (u.toFloat / 1000001.5f) - 1.0f)
      assert(u > -2000003L && u < 2000003L)
    }
    // and the unit is the portable hash mod 2000003, replayable in SQL
    assert(Multimodal.Codecs.stubFeatureUnit(content, 3) ==
      graft.plans.PortableSketch.md5Long("some payload text|3".getBytes("UTF-8")) % 2000003L)
    // dataset path: same units through the per-partition codec plumbing
    val av = Multimodal.fixtureFromDocuments(spark, docs)
      .filter(org.apache.spark.sql.functions.col("kind") =!= "image")
    val row = Multimodal.stubUnits(av.repartition(4), Seq(0, 7))
      .orderBy("media_id").head()
    val item = av.orderBy("media_id").head()
    assert(row.getLong(0) == item.media_id)
    assert(row.getSeq[Long](3) == Seq(
      Multimodal.Codecs.stubFeatureUnit(item.content, 0),
      Multimodal.Codecs.stubFeatureUnit(item.content, 7)))
    intercept[IllegalArgumentException](Multimodal.stubUnits(av, Seq(-1)))
  }

  test("real PNG codec: known 2x2 image round-trips through encode/decode") {
    // hand-built 2x2 with known colors — decode must report true dims,
    // 3 bands, and exact per-band means
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val info = Multimodal.Codecs.decodeImage(bos.toByteArray).get
    assert(info.width == 2 && info.height == 2 && info.bands == 3)
    // each channel: two 255s and two 0s -> mean 127.5
    assert(info.means.toSeq == Seq(127.5, 127.5, 127.5))
    // deterministic generator round-trips its own dims too
    val gen = Multimodal.Codecs.encodePng(5, 3, seed = 99L)
    val genInfo = Multimodal.Codecs.decodeImage(gen).get
    assert(genInfo.width == 5 && genInfo.height == 3)
    // non-image bytes decode to None, not an exception
    assert(Multimodal.Codecs.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.Codecs.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("extractFeatures decodes real image fixtures: dims match metadata") {
    val items = Multimodal.fixtureWithRealImages(spark, docs).repartition(4)
    val feats = Multimodal.extractFeatures(items).collect()
    val images = feats.filter(_.kind == "image")
    assert(images.nonEmpty)
    val meta = items.collect().map(m => m.media_id -> m).toMap
    images.foreach { f =>
      assert(f.decoded_w == meta(f.media_id).width, s"media ${f.media_id} width")
      assert(f.decoded_h == meta(f.media_id).height, s"media ${f.media_id} height")
      assert(f.feature(0) == f.decoded_w.toFloat && f.feature(1) == f.decoded_h.toFloat)
      assert(f.feature.length == Multimodal.FeatureDim)
    }
    // non-image rows keep the stub embedding and zero decoded dims
    assert(feats.filter(_.kind != "image").forall(f => f.decoded_w == 0 && f.decoded_h == 0))
  }

  test("resize rewrites payload and metadata") {
    val items = Multimodal.fixtureFromDocuments(spark, docs)
    val resized = Multimodal.resizeAll(items, 32, 32).head()
    assert(resized.width == 32 && resized.height == 32)
  }

  test("frame sampling explodes only videos with deterministic counts") {
    val items = Multimodal.fixtureFromDocuments(spark, docs)
    val frames = Multimodal.sampleFrames(items, everyMs = 500)
    val nVideos = items.filter(_.kind == "video").count()
    assert(frames.count() > nVideos) // multiple frames per video
    assert(frames.select("media_id").distinct().count() == nVideos)
  }

  test("pHash: tweak-invariant, seed-discriminative, undecodable dropped") {
    import Multimodal.Codecs
    val a = Codecs.phash64(Codecs.encodeGradientPng(48, 32, seed = 7)).get
    val a2 = Codecs.phash64(Codecs.encodeGradientPng(48, 32, seed = 7, tweak = true)).get
    assert(java.lang.Long.bitCount(a ^ a2) <= 2, "one-pixel tweak must barely move the hash")
    // different spectral content -> far apart (allow rare coincidence margin)
    val others = (1L to 20L).filterNot(_ == 7L)
      .map(s => Codecs.phash64(Codecs.encodeGradientPng(48, 32, s)).get)
    val dists = others.map(o => java.lang.Long.bitCount(a ^ o))
    assert(dists.count(_ > 6) >= 17, s"expected most seeds far from seed 7, got $dists")
    assert(Codecs.phash64("not an image".getBytes).isEmpty)
  }

  test("pHash pair join surfaces planted near-duplicates, ids only") {
    import spark.implicits._
    val corpus = Multimodal.fixtureImageCorpus(spark, docs)
    val hashes = Multimodal.imagePhashes(corpus, "media_id", "content")
    assert(hashes.count() == corpus.count()) // every fixture decodes
    val pairs = Multimodal.imagePhashPairs(hashes, maxHamming = 6)
    val planted = docs.select("doc_id").as[Long].collect().filter(_ % 50 == 0).toSet
    val found = pairs.filter($"id_b" === $"id_a" + 1000000L)
      .select("id_a").as[Long].collect().toSet
    assert(planted.subsetOf(found), s"missing planted pairs: ${planted -- found}")
    // verification really bounds the distance
    assert(pairs.agg(org.apache.spark.sql.functions.max("hamming")).head().getInt(0) <= 6)
  }

  test("pHash band census hand frame: per-chunk buckets, cap loss, permyriad") {
    import spark.implicits._
    // maxHamming=1 -> 2 chunks of 32 bits: k=0 reads the low word,
    // k=1 the high word. Low words collide 3x on 5 (over a cap of 2);
    // high words are all distinct.
    val hashes = Seq(
      (1L, (1L << 32) | 5L),
      (2L, (2L << 32) | 5L),
      (3L, (3L << 32) | 5L),
      (4L, (4L << 32) | 9L))
      .toDF("media_id", "phash")
    val got = Multimodal.phashBandCensus(hashes, maxHamming = 1,
        maxBucketSize = 2)
      .collect().map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_buckets"),
          r.getAs[Long]("max_bucket"), r.getAs[Long]("dropped_rows"),
          r.getAs[Long]("dropped_pm")))).toMap
    assert(got(0L) == ((4L, 2L, 3L, 3L, 7500L)))
    assert(got(1L) == ((4L, 4L, 1L, 0L, 0L)))
  }

  test("ensureOracleData inlines the pHash store into the q315 oracle") {
    SparkEntry.ensureOracleData(spark, "/root/testdata/sf0.001")
    val sql = SparkEntry.oracleSql("q315_phash_pair_replay")
    // self-contained: an inline VALUES table, no file reads anywhere
    assert(sql.contains("FROM (VALUES ("))
    assert(!sql.contains("read_parquet"))
    assert(!sql.contains("_unbuilt"))
    // and the inlined frame is the store Spark actually serves
    val served = graft.operators.Multimodal.imagePhashes(
      graft.operators.Multimodal.fixtureImageCorpus(spark, docs),
      "media_id", "content").count()
    val inlined = "\\(-?\\d+,-?\\d+\\)".r.findAllIn(sql).size
    assert(inlined.toLong == served)
  }
}
