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
  * ALL THREE codec legs are REAL on their JDK-supported containers —
  * zero external dependencies:
  *   - images: [[ImageCodec]] decodes/resizes PNG/JPEG/BMP through
  *     `javax.imageio`;
  *   - audio: [[AudioCodec]] decodes/resamples PCM WAV (RIFF/WAVE)
  *     through `javax.sound.sampled` — the JDK ships the WAV codec;
  *   - video: [[VideoCodec]] parses the uncompressed Y4M (YUV4MPEG2)
  *     container — a plain-text header plus raw frame planes, the
  *     format ffmpeg pipes — with pure-JVM code.
  * Compressed audio/video codecs (MP3/AAC/H.264...) do not exist in
  * this environment; payloads in those containers fall back to the
  * clearly-marked DETERMINISTIC STUB (`StubCodec`), as does any typed
  * payload that is not decodable (opaque stand-in bytes) — the
  * dispatch is sniffed per payload, the way a production pipeline
  * quarantines corrupt media rather than failing the batch.
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

  /** [[asImageTable]] completed to all three modalities: every row
    * carries a REAL payload in its type's JDK-decodable container —
    * `doc_id % 3 == 0` a synthesized PNG ([[ImageCodec]]),
    * `% 3 == 1` a 16-bit PCM WAV ([[AudioCodec]], `doc_id % 1200 + 64`
    * samples at 16 kHz), `% 3 == 2` a luma-only Y4M clip
    * ([[VideoCodec]], `(doc_id % 12 + 4) × (doc_id % 8 + 4)` pixels ×
    * `doc_id % 24 + 2` frames). Payload content is closed-form in
    * every leg, so decoded statistics are SQL-derivable; payload bytes
    * go through the real encoders. For audio, `n_frames` carries the
    * PCM frame (sample) count — the WAV container's own framing.
    */
  def asAvTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          (id % 3) match {
            case 0 =>
              val (w, h) = ((id % 24 + 8).toInt, (id % 18 + 8).toInt)
              MediaRow(id, ImageCodec.synthesizePng(id, w, h),
                MediaMeta("image", w, h, 0, 1))
            case 1 =>
              val n = (id % 1200 + 64).toInt
              MediaRow(id, AudioCodec.synthesizeWav(id, n, 16000),
                MediaMeta("audio", 0, 0, 16000, n))
            case _ =>
              val (w, h, nf) = ((id % 12 + 4).toInt, (id % 8 + 4).toInt, (id % 24 + 2).toInt)
              MediaRow(id, VideoCodec.synthesizeY4m(id, w, h, nf),
                MediaMeta("video", w, h, 0, nf))
          }
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

  // ───────────────────────── real audio codec ─────────────────────────

  /** REAL audio codec on `javax.sound.sampled` (the JDK ships a
    * PCM WAV encoder/decoder — zero external dependencies): decode
    * RIFF/WAVE payloads to signed 16-bit mono sample arrays,
    * deterministic nearest-neighbor resample, re-encode through the
    * real writer. All sample math is integer, so results are
    * bit-identical across JVMs, partitionings, and replays.
    * Synthesized test audio puts a closed-form value at every sample
    * index ([[synthSample]]), which makes decoded-sample statistics
    * computable by the SQL oracle without it ever touching a codec.
    */
  object AudioCodec {
    /** Container sniff: RIFF....WAVE — the dispatch test between the
      * real codec and the stub fallback.
      */
    def isWav(bytes: Array[Byte]): Boolean =
      bytes.length >= 12 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

    /** The closed-form sample of synthesized test audio: a value any
      * SQL engine reproduces with `(i*17 + doc_id*29) % 4001 - 2000`
      * (range [-2000, 2000] — comfortably inside 16-bit).
      */
    def synthSample(docId: Long, i: Int): Int =
      ((i.toLong * 17L + docId * 29L) % 4001L).toInt - 2000

    /** Deterministic 16-bit mono PCM WAV of the closed-form samples —
      * real bytes through the real `AudioSystem` writer; PCM is
      * lossless, so a decode recovers [[synthSample]] exactly
      * (spec-verified).
      */
    def synthesizeWav(docId: Long, n: Int, rate: Int): Array[Byte] =
      encodeWav(rate, Array.tabulate(n)(i => synthSample(docId, i)))

    /** Encode signed 16-bit mono samples as a WAV via the real
      * `javax.sound.sampled` writer (little-endian PCM frames).
      */
    def encodeWav(rate: Int, samples: Array[Int]): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a WAV payload to `(sample_rate, signed samples)`.
      * Supports the 16-bit mono PCM layout the engine writes; the
      * decoder honors the container's declared endianness.
      */
    def decodePcm(bytes: Array[Byte]): (Int, Array[Int]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unsupported PCM layout: $fmt")
      val data = ais.readAllBytes()
      val n = data.length / 2
      val out = new Array[Int](n)
      var i = 0
      if (fmt.isBigEndian)
        while (i < n) { out(i) = (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff); i += 1 }
      else
        while (i < n) { out(i) = (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff); i += 1 }
      (fmt.getSampleRate.toInt, out)
    }

    /** Nearest-neighbor resample with the floor-division source map
      * `src(i) = i*n / outN` — the same SQL-mirrorable rule as
      * [[ImageCodec.resizeNearest]]. A production pipeline would use a
      * windowed-sinc filter; that trades oracle-exactness for fidelity
      * without changing any plumbing here.
      */
    def resampleNearest(samples: Array[Int], outN: Int): Array[Int] = {
      require(outN > 0, "target sample count must be positive")
      Array.tabulate(outN)(i => samples((i.toLong * samples.length / outN).toInt))
    }
  }

  // ───────────────────────── real video codec ─────────────────────────

  /** REAL video-container codec for Y4M (YUV4MPEG2) — the uncompressed
    * interchange format ffmpeg pipes (`ffmpeg -f yuv4mpeg2`): an ASCII
    * parameter header, then `FRAME` markers each followed by raw
    * planar pixel data. Pure-JVM parsing, no native codec needed —
    * which is exactly why a training pipeline stages decoded video in
    * this shape. Synthesized test clips use `Cmono` (luma-only, a
    * standard Y4M colorspace) with a closed-form pixel per
    * (frame, x, y); the parser also handles C420/C422/C444 layouts by
    * reading the luma plane and skipping chroma.
    */
  object VideoCodec {
    private val magic = "YUV4MPEG2 ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

    /** Container sniff for the dispatch between real parse and stub. */
    def isY4m(bytes: Array[Byte]): Boolean =
      bytes.length >= magic.length && magic.indices.forall(i => bytes(i) == magic(i))

    /** The closed-form pixel of synthesized test clips:
      * `(x*7 + y*13 + f*19 + doc_id*31) % 256`.
      */
    def synthPixel(docId: Long, f: Int, x: Int, y: Int): Int =
      ((x * 7L + y * 13L + f * 19L + docId * 31L) % 256L).toInt

    /** Deterministic luma-only Y4M clip of the closed-form pixel
      * grid — a real, spec-conforming YUV4MPEG2 stream.
      */
    def synthesizeY4m(docId: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n".getBytes(ascii))
      val frameMark = "FRAME\n".getBytes(ascii)
      var f = 0
      while (f < nFrames) {
        bos.write(frameMark)
        val plane = new Array[Byte](w * h)
        var i = 0
        while (i < plane.length) {
          plane(i) = synthPixel(docId, f, i % w, i / w).toByte
          i += 1
        }
        bos.write(plane)
        f += 1
      }
      bos.toByteArray
    }

    /** Parse a Y4M stream to `(width, height, frames)` where each
      * frame is its luma plane row-major. Chroma planes (C420/C422/
      * C444) are skipped — the luma statistics downstream only need Y.
      */
    def decodeFrames(bytes: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
      require(isY4m(bytes), "payload is not a Y4M stream")
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val headerEnd = bytes.indexOf('\n'.toByte)
      require(headerEnd > 0, "missing Y4M header terminator")
      val toks = new String(bytes, 0, headerEnd, ascii).split(" ")
      var w = -1; var h = -1; var cs = "C420jpeg"
      toks.tail.foreach { t =>
        if (t.nonEmpty) t.charAt(0) match {
          case 'W' => w = t.substring(1).toInt
          case 'H' => h = t.substring(1).toInt
          case 'C' => cs = t
          case _   => () // F (rate), I (interlace), A (aspect), X (extension)
        }
      }
      require(w > 0 && h > 0, s"bad Y4M dims W$w H$h")
      val lumaLen = w * h
      val chromaLen =
        if (cs == "Cmono") 0
        else if (cs.startsWith("C420")) 2 * ((w / 2) * (h / 2))
        else if (cs.startsWith("C422")) 2 * ((w / 2) * h)
        else if (cs.startsWith("C444")) 2 * lumaLen
        else throw new IllegalArgumentException(s"unsupported Y4M colorspace $cs")
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      var pos = headerEnd + 1
      while (pos < bytes.length) {
        require(pos + 5 <= bytes.length &&
          new String(bytes, pos, 5, ascii) == "FRAME", s"missing FRAME marker at $pos")
        var nl = pos + 5 // FRAME may carry parameters up to its newline
        while (nl < bytes.length && bytes(nl) != '\n') nl += 1
        pos = nl + 1
        require(pos + lumaLen + chromaLen <= bytes.length, "truncated Y4M frame")
        val luma = new Array[Int](lumaLen)
        var i = 0
        while (i < lumaLen) { luma(i) = bytes(pos + i) & 0xff; i += 1 }
        frames += luma
        pos += lumaLen + chromaLen
      }
      (w, h, frames.toArray)
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

  /** [[asImageTable]]'s image rows with PLANTED near-duplicates — the
    * corpus the perceptual-hash dedup gate runs on. Image ids group by
    * `base = doc_id - doc_id % 9` (triples {9k, 9k+3, 9k+6} among the
    * `% 3 == 0` image ids); every member renders its BASE's pixel grid
    * with exactly one pixel inverted at a member-specific index, so
    * in-group pairs are perceptual near-duplicates (tiny Hamming
    * distance between average-hashes) while cross-group pairs differ
    * in dimensions or in a large mod-256 brightness wrap (far).
    * Everything is closed-form — base grid [[ImageCodec.synthPixel]],
    * inversion index `doc_id % (w*h)` — so the SQL oracle re-derives
    * the hash bits and the exact pair set without touching a codec;
    * payload bytes still go through the real PNG encoder/decoder.
    */
  def asImageDupTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val base = id - (id % 9)
          val w = (base % 24 + 8).toInt
          val h = (base % 18 + 8).toInt
          val flip = (id % (w.toLong * h)).toInt
          val pix = Array.tabulate(h * w) { i =>
            val v = ImageCodec.synthPixel(base, i % w, i / w)
            if (i == flip) 255 - v else v
          }
          MediaRow(id, ImageCodec.encodeGrayPng(w, h, pix),
            MediaMeta("image", w, h, 0, 1))
        }
      }.toDF()
  }

  /** Average perceptual hash (aHash) of each decodable image row: real
    * decode ([[ImageCodec.decodeLuma]]) → nearest-neighbor resize to a
    * `hashW × hashH` thumbnail ([[ImageCodec.resizeNearest]], the
    * floor-division map a SQL oracle mirrors exactly) → one bit per
    * cell. The threshold is INTEGER-EXACT: bit i is set iff
    * `pix(i) * n > Σ pix` (strictly above the mean with no float
    * division), so the hash is bit-identical across engines, JVMs, and
    * partitionings. Map-only — one task per partition, no shuffle.
    */
  def imageAHash(media: DataFrame, hashW: Int = 8, hashH: Int = 8): DataFrame = {
    require(hashW * hashH <= 64, "hash must fit in 64 bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("meta.media_type") === "image")
      .select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, pix) = ImageCodec.decodeLuma(bytes)
          val q = ImageCodec.resizeNearest(w, h, pix, hashW, hashH)
          val n = q.length
          var total = 0L
          var i = 0
          while (i < n) { total += q(i); i += 1 }
          var hash = 0L
          i = 0
          while (i < n) {
            if (q(i).toLong * n > total) hash |= (1L << i)
            i += 1
          }
          (id, hash)
        }
      }.toDF("doc_id", "ahash")
  }

  /** All image pairs whose average-hashes are within `maxHamming` bits
    * — perceptual near-duplicate detection for image columns, the
    * multimodal leg of the dedup family (re-encoded thumbnails, small
    * overlays, brightness-preserving edits collapse to nearby hashes).
    *
    * Scale shape: the same pigeonhole banding as
    * [[graft.operators.Dedup.simhashPairs]] — `maxHamming + 1` bands
    * over the 64-bit hash, so any pair within the distance shares at
    * least one exact band; candidates meet in a bucket equi-join on
    * lean `(band, bucket)` keys (never an all-pairs product), then one
    * codegen'd `bit_count(xor)` verifies the exact distance. Output is
    * exact by construction: banding guarantees recall, verification
    * guarantees precision.
    */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 63]")
    val nBands = maxHamming + 1
    val sig = imageAHash(media)
    val bandCols = (0 until nBands).map { bId =>
      val lo = bId * 64 / nBands
      val hi = (bId + 1) * 64 / nBands // exclusive
      val width = hi - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(bId).as("band"),
        shiftright(col("ahash"), lo).bitwiseAND(mask).as("bucket"))
    }
    val buckets = sig.select(col("doc_id"), col("ahash"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("ahash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.ahash").bitwiseXOR(col("b.ahash"))).cast("int")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Decoded-sample statistics for audio rows — the gate surface that
    * proves the WAV codec is real: decode through `javax.sound.sampled`
    * and emit the container's sample rate plus integer sample
    * statistics (count, duration, mean |amplitude|, peak, zero
    * crossings). Non-audio / undecodable rows pass their metadata rate
    * through with null statistics, mirroring [[imageStats]]. On
    * synthesized closed-form audio every emitted number is
    * independently computable by the SQL oracle enumerating the same
    * sample formula — a fabricated decode cannot hash-match it.
    */
  def audioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"),
      col("meta.media_type").as("media_type"),
      col("meta.sample_rate").as("sample_rate"))
      .as[(Long, Array[Byte], String, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, content, tpe, metaRate) =>
          if (tpe == "audio" && AudioCodec.isWav(content)) {
            val (rate, s) = AudioCodec.decodePcm(content)
            var absSum = 0L; var peak = 0; var zc = 0L
            var i = 0
            while (i < s.length) {
              val a = math.abs(s(i))
              absSum += a; if (a > peak) peak = a
              if (i > 0 && (s(i - 1) < 0) != (s(i) < 0)) zc += 1
              i += 1
            }
            (id, tpe, rate, Some(s.length.toLong), Some(absSum),
              Some(peak), Some(zc))
          } else (id, tpe, metaRate, None, None, None, None)
        }
      }
      .toDF("doc_id", "media_type", "sample_rate", "n_samples",
        "abs_sum", "amp_peak", "n_zero_cross")
      .select(col("doc_id"), col("media_type"), col("sample_rate"),
        col("n_samples"),
        // 7 dp, NOT 6: n/16000 carries exactly seven decimals
        // (1/16000 = 0.0000625), so every odd n puts a literal 5 in
        // the 7th digit — a STRUCTURAL round-half tie at 6 dp that
        // Spark (BigDecimal HALF_UP on the binary value) and DuckDB
        // (scaled-multiply) break differently (caught by the r13
        // sf0.1 sweep: 3,365 rows flipped). At 7 dp the true value is
        // ON the grid and both engines recover it exactly.
        round(col("n_samples") / col("sample_rate"), 7).as("duration_s"),
        round(col("abs_sum") / col("n_samples"), 6).as("amp_mean"),
        col("amp_peak"), col("n_zero_cross"))
  }

  /** Resample audio rows to `outRate`: real decode → deterministic
    * nearest-neighbor resample (output length `⌊n·outRate/inRate⌋`) →
    * re-encode through the real WAV writer. Non-audio / undecodable
    * rows pass through untouched, like [[resizeImages]]. Feed the
    * result back through [[audioStats]] to prove the full codec
    * round-trip rather than an arithmetic shortcut.
    */
  def resampleAudio(media: DataFrame, outRate: Int): DataFrame = {
    require(outRate > 0, "target rate must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta"))
      .as[(Long, Array[Byte], MediaMeta)]
      .mapPartitions { rows =>
        rows.map { case (id, content, meta) =>
          if (meta.media_type == "audio" && AudioCodec.isWav(content)) {
            val (rate, s) = AudioCodec.decodePcm(content)
            val outN = math.max((s.length.toLong * outRate / rate).toInt, 1)
            val bytes = AudioCodec.encodeWav(outRate, AudioCodec.resampleNearest(s, outN))
            MediaRow(id, bytes, meta.copy(sample_rate = outRate, n_frames = outN))
          } else MediaRow(id, content, meta)
        }
      }.toDF()
  }

  /** Decoded per-frame luma statistics for video rows — the gate
    * surface that proves the Y4M parser is real: parse the container,
    * sample every `stride`-th frame, and emit the frame's decoded
    * dims + integer luma statistics. Only video rows with a parseable
    * payload appear (the sampling plan for opaque rows is
    * [[sampleFrames]]). On synthesized closed-form clips the oracle
    * enumerates the same (frame, pixel) grid in SQL.
    */
  def videoFrameStats(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val step = math.max(stride, 1)
    media.select(col("doc_id"), col("content"), col("meta.media_type"))
      .as[(Long, Array[Byte], String)]
      .filter(r => r._3 == "video" && VideoCodec.isY4m(r._2))
      .flatMap { case (id, content, _) =>
        val (w, h, frames) = VideoCodec.decodeFrames(content)
        (0 until frames.length by step).iterator.map { f =>
          val pix = frames(f)
          var sum = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < pix.length) {
            val p = pix(i)
            sum += p; if (p < mn) mn = p; if (p > mx) mx = p
            i += 1
          }
          (id, f, w, h, frames.length, sum, mn, mx)
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "n_frames",
        "luma_sum", "luma_min", "luma_max")
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
        col("n_frames"),
        round(col("luma_sum") / (col("width") * col("height")), 6).as("mean_luma"),
        col("luma_min"), col("luma_max"))
  }

  /** Frame-sample plan for video rows: explode the stub-sampled frame
    * indices with their byte payload untouched (opaque pass-through).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("meta.media_type") === "video")
      .select(col("doc_id"), col("meta.n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(math.max(stride, 1)))).as("frame_idx"))

  /** [[sampleFrames]] with the sampled-index ARRAY kept whole and
    * digested to one comma-joined string per clip — the ordered array
    * content reaches the gate comparator intact (explode covers the
    * elements but not their per-doc grouping/order as one value).
    * Map-only, no explode, no shuffle.
    */
  def sampleFrameDigest(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("meta.media_type") === "video")
      .select(col("doc_id"), col("meta.n_frames"),
        concat_ws(",", transform(
          sequence(lit(0), col("meta.n_frames") - 1, lit(math.max(stride, 1))),
          i => i.cast("string"))).as("frame_csv"))

  /** Materialize every decodable image payload as a real `.png` FILE
    * under `dir` (named `<doc_id>.png`) — the object-store layout a
    * 100 TB image corpus actually arrives in. Distributed: each
    * partition writes its own files (no driver collect) and creates
    * the target directory itself, so the write works wherever the
    * tasks run. Scope: `dir` must be a POSIX path on shared storage
    * every task reaches (the files land via `java.nio`); an object-
    * store URI needs a Hadoop-FS writer instead — out of scope here,
    * the plumbing under test is the binary-column → file-layout path.
    * Returns the file count (0 for an image-free input — no action
    * runs on an empty plan beyond the count itself).
    */
  def writeImageFiles(media: DataFrame, dir: String): Long = {
    val spark = media.sparkSession
    import spark.implicits._
    // driver-side create too: a zero-image input must still leave the
    // directory present for the downstream binaryFile reader
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    media.filter(col("meta.media_type") === "image")
      .select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        var n = 0L
        rows.foreach { case (id, bytes) =>
          java.nio.file.Files.write(p.resolve(s"$id.png"), bytes)
          n += 1
        }
        Iterator.single(n)
      }
      // sum-aggregate, not reduce: reduce throws on an empty dataset
      .toDF("n").agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
  }

  /** Ingest a directory of image FILES through Spark's `binaryFile`
    * source — the real multimodal ingestion path (payloads as
    * object-store objects, not table cells): doc ids parse from the
    * file names, and the frame is shaped for [[imageStats]] /
    * [[resizeImages]] exactly like the table-born media frames.
    */
  def readImageFiles(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", "*.png")
      .load(dir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.png$", 1)
          .cast("long").as("doc_id"),
        col("content"))

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
