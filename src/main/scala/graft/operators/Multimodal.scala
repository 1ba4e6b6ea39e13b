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

    /** STUB: embed a non-image payload. Real impl: codec decode -> model
      * forward pass. Fake: hash-derived unit-ish vector, deterministic in
      * the payload bytes. */
    def decodeToFeature(content: Array[Byte]): Array[Float] = {
      val h0 = java.util.Arrays.hashCode(content).toLong
      Array.tabulate(FeatureDim) { i =>
        val h = mix(h0, i)
        ((h % 2000003).toFloat / 1000001.5f) - 1.0f
      }
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
