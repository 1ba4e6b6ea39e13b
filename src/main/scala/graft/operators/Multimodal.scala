package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing is real: schema, partition sizing, and the
  * per-partition batch iteration pattern (the Scala analog of
  * `mapInPandas` — one decoder instantiation per partition, streamed row
  * batches, never materializing a partition in memory). The actual codec
  * calls are STUBBED behind [[Codecs]] with deterministic fakes, clearly
  * marked — the image/audio libraries are not available in this
  * environment; swap the stub bodies for JavaCV/ImageIO calls without
  * touching any of the distributed plumbing.
  */
object Multimodal {

  /** One media row: payload + typed metadata travelling together. */
  final case class MediaItem(
      media_id: Long,
      kind: String,           // "image" | "audio" | "video"
      format: String,         // "jpeg" | "wav" | "mp4" | ...
      width: Int,
      height: Int,
      duration_ms: Long,
      content: Array[Byte]
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      decoded_w: Int,         // real decoded width  (0 when not decodable)
      decoded_h: Int,         // real decoded height (0 when not decodable)
      feature: Array[Float]   // fixed-size feature vector
  )

  /** Real decoded-image properties (width, height, raster bands, per-band
    * pixel means). */
  final case class ImageInfo(width: Int, height: Int, bands: Int, means: Array[Double])

  final case class Frame(
      media_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      content: Array[Byte]
  )

  val FeatureDim = 64

  /** ============================ CODECS =============================
    * IMAGE decode is REAL (JDK `javax.imageio` — PNG/JPEG/BMP/GIF, no
    * external dependency): [[Codecs.decodeImage]] returns true pixel
    * dimensions, band count and per-band means, and
    * [[Codecs.encodePng]] produces genuine PNG payloads for fixtures.
    * AUDIO/VIDEO remain deterministic STUBS — no media library for them
    * exists in this environment; their functions mark exactly where a
    * JavaCV/ffmpeg call would go, with the batch shapes already real. */
  object Codecs {
    /** REAL image decode via javax.imageio. None when the payload is not
      * a decodable image (ImageIO sniffs the container from the bytes).
      * Catches ALL non-fatal throwables, not just IOException: plugin
      * readers throw unchecked exceptions (IndexOutOfBounds,
      * NegativeArraySize, IllegalArgument) on valid-magic/corrupt-body
      * payloads, and a poisoned row must fall through to the stub
      * embedding, not fail the partition. */
    def decodeImage(content: Array[Byte]): Option[ImageInfo] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) None
        else {
          val raster = img.getRaster
          val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
          val sums = new Array[Double](bands)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < bands) { sums(b) += raster.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          Some(ImageInfo(w, h, bands, sums.map(_ / (w.toLong * h))))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** REAL PNG encode (fixture builder): deterministic pixels from
      * `seed`, so decoded properties are reproducible everywhere. */
    def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (mix(seed, x.toLong * 7919 + y) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Integer head of the stub embedding: the PORTABLE md5-slice hash
      * ([[graft.plans.PortableSketch.md5Long]]) of `content ++ "|i"`,
      * reduced mod 2000003 with Java's signed remainder — deterministic
      * integer arithmetic an external engine replays literally
      * (`duckMd5Long(payload || '|i') % 2000003`), which is what lets
      * the stub-codec rows carry a hash-exact oracle (q137) instead of
      * hiding behind the rows-only gate. */
    def stubFeatureUnit(content: Array[Byte], i: Int): Long = {
      val suffix = ("|" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val buf = java.util.Arrays.copyOf(content, content.length + suffix.length)
      System.arraycopy(suffix, 0, buf, content.length, suffix.length)
      graft.plans.PortableSketch.md5Long(buf) % 2000003L
    }

    /** STUB: embed a non-image payload. Real impl: codec decode -> model
      * forward pass. Fake: the [[stubFeatureUnit]] integer heads scaled
      * into (-3, 1) — deterministic in the payload bytes. */
    def decodeToFeature(content: Array[Byte]): Array[Float] =
      Array.tabulate(FeatureDim) { i =>
        (stubFeatureUnit(content, i).toFloat / 1000001.5f) - 1.0f
      }

    /** STUB: re-encode at new dimensions. Real impl: scale + encode.
      * Fake: size-proportional deterministic truncation/padding. */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(16, math.min(content.length, w * h / 64))
      java.util.Arrays.copyOf(content, target)
    }

    /** STUB: sample every nth frame of a video payload. Real impl: demux +
      * decode keyframes. Fake: deterministic byte slices. */
    def sampleFrames(content: Array[Byte], everyMs: Long, durationMs: Long): Seq[(Int, Long, Array[Byte])] = {
      val n = math.max(1, (durationMs / math.max(1, everyMs)).toInt)
      (0 until math.min(n, 32)).map { i =>
        val start = if (content.isEmpty) 0 else (i * 31) % math.max(1, content.length)
        val len   = math.min(64, content.length - start)
        (i, i * everyMs, java.util.Arrays.copyOfRange(content, start, start + math.max(0, len)))
      }
    }

    /** REAL 64-bit perceptual hash (DCT pHash): decode (javax.imageio),
      * luminance box-average resample to 32×32 (explicit integer-box
      * loop — not Graphics2D, whose interpolation is platform-dependent),
      * 2D DCT-II, 8×8 low-frequency block, bit = coefficient > mean of
      * the 63 AC coefficients (DC excluded from both mean and bits — it
      * only encodes global brightness). Smooth near-duplicates (crops,
      * re-encodes, small edits) land within a few bits; unrelated images
      * disagree on ~half. None when the payload doesn't decode. */
    def phash64(content: Array[Byte]): Option[Long] =
      decodeImage2d(content).map { case (px, w, h) =>
        val N = 32
        val gray = Array.ofDim[Double](N, N)
        var ty = 0
        while (ty < N) {
          val y0 = ty * h / N
          val y1 = math.max(y0 + 1, (ty + 1) * h / N)
          var tx = 0
          while (tx < N) {
            val x0 = tx * w / N
            val x1 = math.max(x0 + 1, (tx + 1) * w / N)
            var s = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = px(y * w + x)
                s += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                  0.114 * (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            gray(ty)(tx) = s / ((y1 - y0) * (x1 - x0))
            tx += 1
          }
          ty += 1
        }
        // 2D DCT-II, only the 8x8 low-frequency corner is needed
        val cosT = Array.tabulate(8, N)((u, x) => math.cos((2 * x + 1) * u * math.Pi / (2 * N)))
        val d = Array.ofDim[Double](8, 8)
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var y = 0
            while (y < N) {
              var x = 0
              while (x < N) {
                s += gray(y)(x) * cosT(u)(y) * cosT(v)(x)
                x += 1
              }
              y += 1
            }
            d(u)(v) = s
            v += 1
          }
          u += 1
        }
        var mean = 0.0
        var i = 1
        while (i < 64) { mean += d(i / 8)(i % 8); i += 1 }
        mean /= 63.0
        var bits = 0L
        i = 1
        while (i < 64) {
          if (d(i / 8)(i % 8) > mean) bits |= (1L << i)
          i += 1
        }
        bits
      }

    /** Decoded ARGB pixel array (row-major) + dims, shared by [[phash64]]. */
    private def decodeImage2d(content: Array[Byte]): Option[(Array[Int], Int, Int)] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        if (img == null) None
        else Some((img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth),
          img.getWidth, img.getHeight))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Smooth deterministic fixture image: two seed-derived sinusoidal
      * plaids (low-frequency but spectrally DIVERSE across seeds, so
      * unrelated fixtures land far apart in pHash space while remaining
      * the smooth regime pHash is built for), optionally with a single
      * tweaked pixel (`tweak`) to fabricate a near-duplicate. */
    def encodeGradientPng(w: Int, h: Int, seed: Long, tweak: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      def f(i: Long, m: Int): Double = ((mix(seed, i) >>> 8) % m).toDouble
      val (fx, fy, gx, gy) = (1 + f(1, 5), f(2, 6), f(3, 6), 1 + f(4, 4))
      val (p1, p2) = (f(5, 628) / 100.0, f(6, 628) / 100.0)
      val tau = 2 * math.Pi
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val lum = 128.0 + 60.0 * math.sin(tau * (fx * x / w + fy * y / h) + p1) +
            40.0 * math.cos(tau * (gx * x / w + gy * y / h) + p2)
          val c = math.max(0, math.min(255, lum.toInt))
          img.setRGB(x, y, (c << 16) | (c << 8) | c)
          x += 1
        }
        y += 1
      }
      if (tweak) img.setRGB(w / 2, h / 2, (img.getRGB(w / 2, h / 2) ^ 0x010101) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    private def mix(a: Long, b: Long): Long = {
      var x = a ^ (b * 0x9E3779B97F4A7C15L)
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
  }
  /* ================================================================ */

  /** Feature extraction: per-partition batch decode (mapPartitions = one
    * codec/model instantiation per partition, rows streamed through it).
    * Narrow, no shuffle; partition sizing is the caller's knob via
    * `spark.sql.files.maxPartitionBytes` since media payloads dominate.
    *
    * Image payloads decode FOR REAL: feature = [width, height, bands,
    * per-band means...] padded to [[FeatureDim]] with the payload-hash
    * tail, and `decoded_w`/`decoded_h` carry the true pixel dimensions so
    * callers can assert them against the metadata columns. Non-image (or
    * undecodable) payloads fall through to the stub embedding with
    * decoded dims 0. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // real impl: initialize decoder/model ONCE here, per partition
      it.map { m =>
        val decoded = if (m.kind == "image") Codecs.decodeImage(m.content) else None
        decoded match {
          case Some(info) =>
            val tail = Codecs.decodeToFeature(m.content)
            val head = Array(info.width.toFloat, info.height.toFloat, info.bands.toFloat) ++
              info.means.map(_.toFloat)
            val feature = (head ++ tail).take(FeatureDim)
            MediaFeatures(m.media_id, m.kind, m.content.length.toLong,
              info.width, info.height, feature)
          case None =>
            MediaFeatures(m.media_id, m.kind, m.content.length.toLong, 0, 0,
              Codecs.decodeToFeature(m.content))
        }
      }
    }
  }

  /** Stub-codec AUDIT SURFACE: the integer feature heads
    * ([[Codecs.stubFeatureUnit]]) for the requested dims, through the
    * same per-partition batch plumbing as [[extractFeatures]] — so the
    * oracle-gated query (q137) exercises the genuine codec path (JVM
    * byte-array arithmetic inside mapPartitions), not a Catalyst
    * re-derivation of it. One `units` array per row, `dims`-ordered. */
  def stubUnits(items: Dataset[MediaItem], dims: Seq[Int]): DataFrame = {
    import items.sparkSession.implicits._
    require(dims.nonEmpty && dims.forall(i => i >= 0 && i < FeatureDim),
      s"dims must be within [0, $FeatureDim)")
    items.mapPartitions { it =>
      it.map(m => (m.media_id, m.kind, m.content.length.toLong,
        dims.map(i => Codecs.stubFeatureUnit(m.content, i))))
    }.toDF("media_id", "kind", "n_bytes", "units")
  }

  /** Resize: payload-to-payload map, preserving metadata columns. */
  def resizeAll(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map(m =>
      m.copy(width = w, height = h, content = Codecs.resize(m.content, w, h))))
  }

  /** Frame sampling: one video row -> many frame rows (flatMap — the
    * streaming-safe explode for imperatively-generated children). */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Long): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      Codecs.sampleFrames(m.content, everyMs, m.duration_ms).map {
        case (i, ts, bytes) => Frame(m.media_id, i, ts, bytes)
      }
    })
  }

  /** `(media_id, phash)` for decodable payloads in a binary-column
    * DataFrame — the per-partition codec boundary (one decoder per
    * partition, undecodable rows dropped, never failing the partition). */
  def imagePhashes(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Codecs.phash64(bytes).map(p => (id, p))
      })
      .toDF("media_id", "phash")
  }

  /** NEAR-DUPLICATE IMAGE PAIRS by pHash Hamming distance ≤ `maxHamming`:
    * the SimHash pigeonhole shape on perceptual hashes — split the 64-bit
    * hash into maxHamming+1 chunks (≤ maxHamming differing bits leave at
    * least one chunk equal), equi-join per chunk with capped buckets,
    * verify candidates with one `bit_count(xor)`. Ids and 8-byte hashes
    * through the shuffle, payload bytes never — the image-dedup plan that
    * survives a billion-image corpus. */
  /** The pigeonhole BANDING shared by [[imagePhashPairs]] and
    * [[phashBandCensus]] (one definition, so the census audits the
    * exact buckets the join uses): maxHamming+1 chunks of the 64-bit
    * hash — ≤ maxHamming differing bits leave at least one chunk equal
    * — with the top chunk absorbing the remainder bits. Emits one row
    * per (id, k, chunk) off a checkpointed hash frame (the self-join
    * fans the upstream out twice and the explode re-reads per chunk;
    * upstream is the DECODE stage — the signature-frame checkpoint
    * rule; measured 2× on q102 at sf0.1). */
  private def phashBands(phashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, s"maxHamming in [0,32), got $maxHamming")
    val chunks = maxHamming + 1
    val width = 64 / chunks
    phashes.localCheckpoint(true)
      .select(col("media_id").as("id"), col("phash"),
        explode(expr(
          s"""transform(sequence(0, ${chunks - 1}), k -> struct(k AS k,
             |CASE WHEN k = ${chunks - 1} THEN shiftrightunsigned(phash, k * $width)
             |ELSE shiftrightunsigned(phash, k * $width) & ${(1L << width) - 1}L
             |END AS chunk))""".stripMargin)).as("c"))
      .select(col("id"), col("phash"), col("c.k"), col("c.chunk"))
  }

  /** BUCKET-CAP LOSS CENSUS over the pigeonhole bands: the honesty
    * meter for the banded join. The cap ([[BucketCap]]) bounds a
    * degenerate corpus's candidate blow-up by DROPPING over-cap
    * buckets — which silently costs recall. This readout says, per
    * chunk position: how many buckets, how big the largest is, and how
    * many rows the cap would drop (with a truncating permyriad), so a
    * corpus owner can see the recall cost BEFORE trusting the pair
    * output. A hash family drifting toward degeneracy (the tiny-image
    * fixture's low DCT diversity, a pathological crawl) shows up here
    * first. One groupBy over the banded frame (7 rows/image) to
    * (k, chunk) cells, then a k-bounded rollup — no joins at all. */
  def phashBandCensus(
      phashes: DataFrame,
      maxHamming: Int = 6,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    phashBands(phashes, maxHamming)
      .groupBy(col("k"), col("chunk"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("k"))
      .agg(sum(col("_n")).as("n_rows"),
        count(lit(1)).as("n_buckets"),
        max(col("_n")).as("max_bucket"),
        sum(when(col("_n") > maxBucketSize, col("_n")).otherwise(0L))
          .as("dropped_rows"))
      .select(col("k").cast("long").as("k"), col("n_rows"),
        col("n_buckets"), col("max_bucket"), col("dropped_rows"),
        expr("CAST(10000 * dropped_rows DIV n_rows AS BIGINT)")
          .as("dropped_pm"))
      .orderBy("k")
  }

  def imagePhashPairs(
      phashes: DataFrame,
      maxHamming: Int = 6,
      maxBucketSize: Int = 1000
  ): DataFrame = {
    val banded = phashBands(phashes, maxHamming)
    // capped feeds BOTH join sides: materialize it once (it is banded-
    // sized, 7 rows per image) or the explode + over-cap census run twice
    val capped = BucketCap.dropOverCap(banded, Seq("k", "chunk"), maxBucketSize)
      .localCheckpoint(true)
    val l = capped.select(col("k"), col("chunk"), col("id").as("id_a"), col("phash").as("ph_a"))
    val r = capped.select(col("k"), col("chunk"), col("id").as("id_b"), col("phash").as("ph_b"))
    l.join(r, Seq("k", "chunk"))
      .filter(col("id_a") < col("id_b"))
      // verify BEFORE the dedup shuffle: bit_count is a per-row ALU op
      // while dropDuplicates shuffles its whole input, so filtering first
      // shrinks the shuffled stream from every co-bucketed candidate to
      // the true near-dups (hamming is pair-determined, so dedup order is
      // immaterial). The tiny-image fixture makes this the dominant cost:
      // its pHash diversity is low, buckets run heavy, and candidates
      // outnumber matches ~20:1.
      .withColumn("hamming", expr("bit_count(ph_a ^ ph_b)"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "hamming")
  }

  /** Deterministic REAL-image corpus off the documents table: one smooth
    * gradient PNG per doc (seeded by doc_id), plus a PLANTED one-pixel
    * near-duplicate (id + 1_000_000) for every 50th doc — pairs the
    * pHash join must surface, making recall self-verifying without an
    * image-capable oracle.
    *
    * The id stream is REPARTITIONED before the encode stage: the ids come
    * from a small parquet scan (one input split), but the codec work they
    * seed is per-ROW expensive — without the spread, the whole
    * encode+decode pipeline runs on a single core (measured 15 s at
    * sf0.1 vs ~1 s spread). The general rule for binary-media stages:
    * partition by expected DECODE COST (row count × per-row work), never
    * by the byte size of whatever narrow column happens to feed them. */
  def fixtureImageCorpus(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    val np = spark.sessionState.conf.numShufflePartitions
    val ids = documents.select(col("doc_id").cast("long")).as[Long].repartition(np)
    val base = ids.mapPartitions(_.map(id =>
      (id, Codecs.encodeGradientPng(48, 32, seed = id))))
    val planted = ids.filter(_ % 50 == 0).mapPartitions(_.map(id =>
      (id + 1000000L, Codecs.encodeGradientPng(48, 32, seed = id, tweak = true))))
    base.union(planted).toDF("media_id", "content")
  }

  /** Deterministic synthetic media fixture derived from the documents
    * table (text bytes as payload) so the plumbing is testable without
    * real codecs. */
  def fixtureFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        element_at(array(lit("jpeg"), lit("wav"), lit("mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(16)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(9)) * 64 + 64).cast("int").as("height"),
        (pmod(col("doc_id"), lit(100)) * 1000 + 1000).as("duration_ms"),
        col("text").cast("binary").as("content"))
      .as[MediaItem]
  }

  /** [[fixtureFromDocuments]] with REAL payloads for the image rows: a
    * genuine (tiny, deterministic) PNG per item, its metadata width/height
    * set to the encoded pixel dimensions — so decode results are
    * verifiable image properties, not fixture echoes. Generation happens
    * per partition (the encoder is the per-partition "codec" here); audio
    * and video rows keep the byte-payload stand-in. */
  def fixtureWithRealImages(spark: SparkSession, documents: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    fixtureFromDocuments(spark, documents).mapPartitions(_.map { m =>
      if (m.kind != "image") m
      else {
        val w = (m.media_id % 6 + 2).toInt
        val h = (m.media_id % 4 + 2).toInt
        m.copy(format = "png", width = w, height = h,
          content = Codecs.encodePng(w, h, seed = m.media_id))
      }
    })
  }
}
