package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class PqSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("encode: m codes per vector, each within the codebook range") {
    val books = Pq.codebooks(emb, m = 8, k = 16, dim = 64)
    books.length shouldBe 8
    books(0).length shouldBe 16
    books(0)(0).length shouldBe 8
    val codes = Pq.encode(emb, books)
    codes.count() shouldBe emb.count()
    codes.filter("size(codes) != 8").count() shouldBe 0
    codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 16).count() shouldBe 0
  }

  test("topK: k rows per query, exact rerank cosines, deterministic") {
    val queries = emb.filter(col("vec_id") < 5)
    val pq = Pq.topK(emb, queries, k = 10)
    pq.groupBy("query_id").count().filter(col("count") =!= 10).count() shouldBe 0
    // every emitted cosine matches the brute-force value (rerank is exact)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
    pq.join(brute.select(col("query_id"), col("neighbor_id"), col("cos").as("cos_bf")),
        Seq("query_id", "neighbor_id"))
      .filter(col("cos") =!= col("cos_bf")).count() shouldBe 0
    // stable under repartitioning
    val again = Pq.topK(emb.repartition(7), queries, k = 10)
    again.orderBy("query_id", "rank").collect() shouldBe
      pq.orderBy("query_id", "rank").collect()
  }

  test("k-means codebook refinement does not lose recall vs the fixed sample") {
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id")
    def hits(iters: Int): Long =
      Pq.topK(emb, queries, k = 10, kmeansIters = iters)
        .select("query_id", "neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id"), "left_semi").count()
    hits(2) should be >= hits(0)
  }

  test("selfCheck: recall >= 0.8 and exact cosines on this corpus") {
    val queries = emb.filter(col("vec_id") < 5)
    val row = Pq.selfCheck(emb, queries, k = 10).collect()
    row.length shouldBe 1
    row.head.getBoolean(0) shouldBe true
    row.head.getBoolean(1) shouldBe true
  }
}
