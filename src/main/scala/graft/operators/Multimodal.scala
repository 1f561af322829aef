package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms — the JVM
  * equivalent of `mapInPandas` (an iterator of fixed-size batches per
  * partition, vectorizable decode per batch, streaming output).
  *
  * The IMAGE leg of the codec is REAL: [[ImageCodec]] decodes and
  * resizes PNG/JPEG/BMP payloads through `javax.imageio` (shipped with
  * the JDK — no external dependency), so image gates measure actual
  * pixels. Audio/video decode remains a clearly-marked DETERMINISTIC
  * STUB (`StubCodec`): no audio/video codecs exist in this
  * environment. Payloads that are typed `image` but not decodable
  * (opaque stand-in bytes) also fall back to the stub — the dispatch
  * is sniffed per payload, the way a production pipeline quarantines
  * corrupt media rather than failing the batch.
  *
  * Scale notes: all transforms here are map-only over binary columns —
  * pure split parallelism; batching bounds peak memory per task at
  * `batchSize × max payload`, the knob that matters when payloads are
  * megabytes. Nothing shuffles until a downstream groupBy/join.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Wrap a text corpus as an opaque media table: `content` is the
    * UTF-8 bytes (a stand-in for image/audio payloads — the engine
    * must treat it as opaque), with typed metadata derived
    * deterministically.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("media_type"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(col("doc_id"), lit(300)) + 1).cast("int").as("n_frames")).as("meta"))

  /** Typed row of [[asImageTable]] — `meta` field order matches
    * [[metaSchema]].
    */
  case class MediaMeta(media_type: String, width: Int, height: Int,
                       sample_rate: Int, n_frames: Int)
  case class MediaRow(doc_id: Long, content: Array[Byte], meta: MediaMeta)

  /** [[asMediaTable]] with REAL payloads on the image rows: each
    * `doc_id % 3 == 0` row carries a deterministic synthesized PNG
    * (closed-form pixels [[ImageCodec.synthPixel]], real `imageio`
    * encoder, dims `(doc_id%24+8) × (doc_id%18+8)` — small on purpose:
    * the SQL oracle re-derives pixel statistics by enumerating the
    * grid). Audio/video rows keep the opaque text-byte stand-ins (no
    * audio/video codec exists in this environment), so the table
    * exercises both codec legs: real decode AND the documented stub
    * fallback. Synthesis is a map-only partition transform — the same
    * batched shape as the downstream transforms.
    */
  def asImageTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val tpe = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val meta = MediaMeta(tpe,
            if (tpe == "image") (id % 24 + 8).toInt else (id % 640 + 32).toInt,
            if (tpe == "image") (id % 18 + 8).toInt else (id % 480 + 32).toInt,
            16000, (id % 300 + 1).toInt)
          val content =
            if (tpe == "image") ImageCodec.synthesizePng(id, meta.width, meta.height)
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          MediaRow(id, content, meta)
        }
      }.toDF()
  }

  // ───────────────────────── real image codec ─────────────────────────

  /** REAL image codec on `javax.imageio` (JDK-shipped PNG/JPEG/BMP —
    * zero external dependencies): decode to a luma plane, deterministic
    * nearest-neighbor resize, lossless grayscale-PNG re-encode. All
    * pixel math is integer, so results are bit-identical across JVMs,
    * partitionings, and replays — the property every gate oracle here
    * leans on. Synthesized test images put a closed-form pixel value at
    * every coordinate, which makes decoded-pixel statistics computable
    * by the SQL oracle without it ever touching a codec.
    */
  object ImageCodec {
    private val pngMagic =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    /** Cheap container sniff — the dispatch test between the real codec
      * and the stub fallback. (ImageIO could also sniff, but a stream
      * open per undecodable payload is wasted work on mostly-opaque
      * corpora.)
      */
    def isPng(bytes: Array[Byte]): Boolean =
      bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == pngMagic(i))

    /** The closed-form pixel of synthesized test images: a value any
      * SQL engine reproduces with `(x*7 + y*13 + doc_id*31) % 256`.
      */
    def synthPixel(docId: Long, x: Int, y: Int): Int =
      (((x * 7L + y * 13L + docId * 31L) % 256L) + 256L).toInt % 256

    /** Deterministic grayscale PNG of the closed-form pixel grid —
      * real bytes through the real encoder; PNG is lossless, so a
      * decode recovers [[synthPixel]] exactly (spec-verified).
      */
    def synthesizePng(docId: Long, w: Int, h: Int): Array[Byte] = {
      val pix = Array.tabulate(h * w)(i => synthPixel(docId, i % w, i / w))
      encodeGrayPng(w, h, pix)
    }

    /** Decode any imageio-supported payload to `(width, height, luma
      * row-major)`. Single-band images read their sample plane
      * directly; multi-band decode through the integer Rec.601 luma
      * `(299r + 587g + 114b + 500) / 1000` — integer math, no
      * float rounding to drift across platforms.
      */
    def decodeLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h)
      val raster = img.getRaster
      if (raster.getNumBands == 1) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
            out(y * w + x) = (299 * r + 587 * g + 114 * b + 500) / 1000
            x += 1
          }
          y += 1
        }
      }
      (w, h, out)
    }

    /** Nearest-neighbor resize with the floor-division source map
      * `src(x) = x*w / outW` — the one resampling rule a SQL oracle can
      * mirror exactly (`(x * w) // outW`). Bilinear would be the
      * production default; it trades oracle-exactness for smoothness
      * without changing any plumbing here.
      */
    def resizeNearest(w: Int, h: Int, pix: Array[Int],
                      outW: Int, outH: Int): Array[Int] = {
      require(outW > 0 && outH > 0, "target dims must be positive")
      Array.tabulate(outH * outW) { i =>
        val (x, y) = (i % outW, i / outW)
        pix((y.toLong * h / outH).toInt * w + (x.toLong * w / outW).toInt)
      }
    }

    /** Lossless grayscale PNG encode of a luma plane via the real
      * imageio writer.
      */
    def encodeGrayPng(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, pix(y * w + x)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  // ───────────────────────── stub codec ─────────────────────────

  /** DETERMINISTIC STUB for the media decode step — replace with a real
    * codec (JNI ffmpeg/libjpeg or a Pandas UDF in the PySpark facade)
    * in production. Fabricates a stable decoded frame from the payload
    * bytes so the downstream plumbing is fully testable.
    */
  object StubCodec {
    /** "Decode" = byte statistics + a seeded rolling state — stands in
      * for pixel/sample planes.
      */
    def decode(content: Array[Byte]): (Long, Double) = {
      var h = 1125899906842597L // rolling polynomial hash (stub)
      var sum = 0L
      var i = 0
      while (i < content.length) {
        h = 31 * h + content(i)
        sum += content(i) & 0xff
        i += 1
      }
      (h, if (content.length == 0) 0.0 else sum.toDouble / content.length)
    }

    /** "Feature vector" of the decoded payload: `dim` floats derived
      * from the rolling hash — the shape (Array[Float], unit scale) a
      * real visual/audio encoder would emit.
      */
    def features(content: Array[Byte], dim: Int): Array[Float] = {
      val (h0, _) = decode(content)
      val out = new Array[Float](dim)
      var h = h0
      var i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L // LCG step
        out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
        i += 1
      }
      out
    }

    /** "Resize": stub keeps the byte length and the target dims. */
    def resize(content: Array[Byte], w: Int, hgt: Int): (Int, Int, Int) =
      (w, hgt, content.length)

    /** "Frame sample": every `stride`-th frame index of `nFrames`. */
    def frameSample(nFrames: Int, stride: Int): Seq[Int] =
      0 until nFrames by math.max(stride, 1)
  }

  // ─────────────────── batched partition transforms ───────────────────

  /** Output row of [[extractFeatures]]. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           byte_mean: Double, feature: Array[Float],
                           batch_ordinal: Int)

  /** Real pixel-statistics feature vector of a decoded luma plane —
    * what the visual-encoder stand-in emits for decodable images:
    * `[mean, std, min, max, 4 quadrant means, 8-bin histogram]` all
    * scaled to [0, 1], fitted to `dim` (truncate / zero-pad). Pure
    * integer accumulation before the final scaling, so the vector is
    * bit-stable across partitionings.
    */
  private[operators] def imageFeatureVec(w: Int, h: Int, pix: Array[Int],
                                         dim: Int): Array[Float] = {
    val n = pix.length.toDouble
    var sum = 0L; var sumSq = 0L; var mn = 255; var mx = 0
    val hist = new Array[Long](8)
    val quad = new Array[Long](4); val quadN = new Array[Long](4)
    var i = 0
    while (i < pix.length) {
      val p = pix(i)
      sum += p; sumSq += p.toLong * p
      if (p < mn) mn = p; if (p > mx) mx = p
      hist(p >> 5) += 1
      val q = (if (i / w >= h / 2) 2 else 0) + (if (i % w >= w / 2) 1 else 0)
      quad(q) += p; quadN(q) += 1
      i += 1
    }
    val mean = sum / n
    val std = math.sqrt(math.max(sumSq / n - mean * mean, 0.0))
    val full = Array(mean / 255.0, std / 255.0, mn / 255.0, mx / 255.0) ++
      quad.zip(quadN).map { case (s, c) => if (c == 0) 0.0 else s / c.toDouble / 255.0 } ++
      hist.map(_ / n)
    Array.tabulate(dim)(j => if (j < full.length) full(j).toFloat else 0.0f)
  }

  /** Decode + feature-extract every payload, `batchSize` rows at a
    * time per partition — the mapInPandas batch contract: the decode
    * sees a whole batch (vectorizable), memory is bounded by one batch,
    * output streams per batch. `batch_ordinal` exposes the batch index
    * for tests that pin the batch shape.
    *
    * Decodable image payloads get REAL pixel-statistics features
    * ([[imageFeatureVec]] over the `imageio`-decoded luma plane);
    * everything else falls back to the documented stub. `n_bytes` and
    * `byte_mean` are payload-byte statistics either way — real in both
    * legs.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = media.select(col("doc_id"), col("content"), col("meta.media_type"))
    src.as[(Long, Array[Byte], String)].mapPartitions { rows =>
      rows.grouped(batchSize).zipWithIndex.flatMap { case (batch, ordinal) =>
        // a real codec would decode the whole batch in one vectorized
        // call here; imageio decodes element-wise
        batch.iterator.map { case (id, content, mediaType) =>
          val (_, mean) = StubCodec.decode(content)
          val feature =
            if (mediaType == "image" && ImageCodec.isPng(content)) {
              val (w, h, pix) = ImageCodec.decodeLuma(content)
              imageFeatureVec(w, h, pix, dim)
            } else StubCodec.features(content, dim)
          MediaFeatures(id, mediaType, content.length.toLong, mean,
            feature, ordinal)
        }
      }
    }.toDF()
  }

  /** Resize image rows; audio/video rows pass through untouched
    * (media-type dispatch happens engine-side, not codec-side).
    * Decodable (PNG) image payloads go through the REAL path: `imageio`
    * decode → deterministic nearest-neighbor resample → lossless
    * grayscale-PNG re-encode; the emitted dims are read back off the
    * RESIZED raster and `n_bytes`/`content` are the re-encoded
    * payload's. Undecodable image-typed payloads (opaque stand-ins)
    * keep the documented stub. Select away `content` for the
    * stats-only projection.
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.media_type"),
      col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], String, Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, content, tpe, w, h) =>
          if (tpe == "image" && ImageCodec.isPng(content)) {
            val (sw, sh, pix) = ImageCodec.decodeLuma(content)
            val out = ImageCodec.resizeNearest(sw, sh, pix, targetW, targetH)
            val bytes = ImageCodec.encodeGrayPng(targetW, targetH, out)
            (id, tpe, targetW, targetH, bytes.length.toLong, bytes)
          } else if (tpe == "image") {
            val (nw, nh, nb) = StubCodec.resize(content, targetW, targetH)
            (id, tpe, nw, nh, nb.toLong, content)
          } else (id, tpe, w, h, content.length.toLong, content)
        }
      }.toDF("doc_id", "media_type", "width", "height", "n_bytes", "content")
  }

  /** Decoded-pixel statistics — the gate surface that PROVES the codec
    * is real: for every decodable image payload, decode through
    * `imageio` and emit the raster dims plus luma statistics (mean,
    * min, max, mean horizontal gradient); non-image / undecodable rows
    * pass their metadata dims through with null statistics. On
    * synthesized closed-form images every emitted number is
    * independently computable by the SQL oracle enumerating the same
    * grid — a fabricated decode cannot hash-match it. Accepts either
    * the `meta`-struct table shape or [[resizeImages]]' flat output.
    */
  def imageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val src =
      if (media.columns.contains("meta"))
        media.select(col("doc_id"), col("content"),
          col("meta.media_type").as("media_type"),
          col("meta.width").as("width"), col("meta.height").as("height"))
      else media.select(col("doc_id"), col("content"), col("media_type"),
        col("width"), col("height"))
    src.as[(Long, Array[Byte], String, Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, content, tpe, w, h) =>
          if (tpe == "image" && ImageCodec.isPng(content)) {
            val (dw, dh, pix) = ImageCodec.decodeLuma(content)
            var sum = 0L; var mn = 255; var mx = 0
            var i = 0
            while (i < pix.length) {
              val p = pix(i)
              sum += p; if (p < mn) mn = p; if (p > mx) mx = p
              i += 1
            }
            var gsum = 0L; var y = 0
            while (y < dh) {
              var x = 0
              while (x < dw - 1) {
                gsum += math.abs(pix(y * dw + x + 1) - pix(y * dw + x)); x += 1
              }
              y += 1
            }
            (id, tpe, dw, dh, Some(dw.toLong * dh), Some(sum),
              Some(mn), Some(mx), Some(gsum), Some((dw - 1).toLong * dh))
          } else
            (id, tpe, w, h, None, None, None, None, None, None)
        }
      }
      .toDF("doc_id", "media_type", "width", "height", "n_pixels",
        "luma_sum", "luma_min", "luma_max", "grad_sum", "n_grad")
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("n_pixels"),
        round(col("luma_sum") / col("n_pixels"), 6).as("mean_luma"),
        col("luma_min"), col("luma_max"),
        when(col("n_grad") > 0, round(col("grad_sum") / col("n_grad"), 6))
          .as("grad_mean"))
  }

  /** Frame-sample plan for video rows: explode the stub-sampled frame
    * indices with their byte payload untouched (opaque pass-through).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("meta.media_type") === "video")
      .select(col("doc_id"), col("meta.n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(math.max(stride, 1)))).as("frame_idx"))

  /** Pure-relational binary statistics (no stub involved): payload
    * sizes and content hashes straight off the binary column — the
    * pushdown-friendly half of the multimodal surface.
    */
  def binaryStats(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("meta.media_type").as("media_type"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_md5"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))
}
