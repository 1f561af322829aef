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
  * The decode step itself is a clearly-marked DETERMINISTIC STUB
  * (`StubCodec`): no image/audio codecs exist in this environment, so
  * it fabricates a stable "decoded" representation from the bytes.
  * Everything around it — schema, metadata typing, batch shape,
  * partition streaming, feature-vector output — is the real pipeline
  * and is what the tests pin down. Swapping `StubCodec` for a JNI/
  * library codec changes no plan shape.
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

  /** Decode + feature-extract every payload, `batchSize` rows at a
    * time per partition — the mapInPandas batch contract: the decode
    * sees a whole batch (vectorizable), memory is bounded by one batch,
    * output streams per batch. `batch_ordinal` exposes the batch index
    * for tests that pin the batch shape.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = media.select(col("doc_id"), col("content"), col("meta.media_type"))
    src.as[(Long, Array[Byte], String)].mapPartitions { rows =>
      rows.grouped(batchSize).zipWithIndex.flatMap { case (batch, ordinal) =>
        // a real codec would decode the whole batch in one vectorized
        // call here; the stub decodes element-wise
        batch.iterator.map { case (id, content, mediaType) =>
          val (_, mean) = StubCodec.decode(content)
          MediaFeatures(id, mediaType, content.length.toLong, mean,
            StubCodec.features(content, dim), ordinal)
        }
      }
    }.toDF()
  }

  /** Resize plan for image rows: batched partition transform emitting
    * the stub-resized dims; audio/video rows pass through untouched
    * (media-type dispatch happens engine-side, not codec-side).
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("meta.media_type"),
      col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], String, Int, Int)]
      .mapPartitions { rows =>
        rows.map { case (id, content, tpe, w, h) =>
          if (tpe == "image") {
            val (nw, nh, nb) = StubCodec.resize(content, targetW, targetH)
            (id, tpe, nw, nh, nb.toLong)
          } else (id, tpe, w, h, content.length.toLong)
        }
      }.toDF("doc_id", "media_type", "width", "height", "n_bytes")
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
