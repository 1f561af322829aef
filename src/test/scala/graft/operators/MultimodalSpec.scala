package graft.operators

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class MultimodalSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val media = Multimodal.asMediaTable(docs)

  test("media table: opaque binary content + typed metadata struct") {
    media.schema("content").dataType.simpleString shouldBe "binary"
    media.schema("meta").dataType.simpleString should include("media_type")
    media.select("meta.media_type").distinct().as[String].collect().sorted shouldBe
      Array("audio", "image", "video")
  }

  test("extractFeatures: batch shape honored (batch_ordinal counts groups of batchSize)") {
    val out = Multimodal.extractFeatures(media.repartition(2), dim = 8, batchSize = 50)
    // 500 docs over 2 partitions -> ordinals 0..4 per partition of 250
    out.agg(max("batch_ordinal")).as[Int].head() shouldBe 4
    out.count() shouldBe docs.count()
    out.select(functions.size(col("feature"))).distinct().as[Int].collect() shouldBe Array(8)
  }

  test("extractFeatures deterministic across partitionings") {
    val a = Multimodal.extractFeatures(media, dim = 8)
      .select("doc_id", "n_bytes", "byte_mean", "feature")
      .orderBy("doc_id").collect()
    val b = Multimodal.extractFeatures(media.repartition(7), dim = 8)
      .select("doc_id", "n_bytes", "byte_mean", "feature")
      .orderBy("doc_id").collect()
    a.map(_.toString) shouldBe b.map(_.toString)
  }

  test("stub feature values are unit-scaled and nonconstant") {
    val feats = Multimodal.extractFeatures(media.limit(20), dim = 16)
      .select("feature").as[Array[Float]].collect()
    all(feats.flatten.toSeq) should (be >= 0.0f and be <= 1.0f)
    feats.map(_.toSeq).distinct.length should be > 1
  }

  test("resizeImages touches only image rows") {
    val out = Multimodal.resizeImages(media, 224, 224)
    out.filter(col("media_type") === "image")
      .select("width", "height").distinct().collect().map(r => (r.getInt(0), r.getInt(1))) shouldBe
      Array((224, 224))
    val untouched = out.filter(col("media_type") =!= "image")
      .join(media.select(col("doc_id"), col("meta.width").as("w0")), "doc_id")
      .filter(col("width") =!= col("w0"))
    untouched.count() shouldBe 0
  }

  test("sampleFrames strides frame indices for video rows only") {
    val out = Multimodal.sampleFrames(media, 30)
    out.select("doc_id").distinct().count() shouldBe
      media.filter(col("meta.media_type") === "video").count()
    out.filter(pmod(col("frame_idx"), lit(30)) =!= 0).count() shouldBe 0
    out.filter(col("frame_idx") >= col("n_frames")).count() shouldBe 0
  }

  test("binaryStats matches direct computation") {
    val out = Multimodal.binaryStats(media)
    val direct = docs.select(col("doc_id"),
      functions.length(col("text")).cast("long").as("expect_bytes"), // ASCII corpus
      md5(encode(col("text"), "UTF-8")).as("expect_md5"))
    out.join(direct, "doc_id")
      .filter(col("n_bytes") =!= col("expect_bytes") ||
        col("content_md5") =!= col("expect_md5")).count() shouldBe 0
  }
}
