package graft.functions

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class VectorExpressionsSpec extends SparkSuite with Matchers {
  import spark.implicits._

  test("DotProduct matches manual double accumulation on float arrays") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].collect()
    got(0) shouldBe (1.0 * 4 + 2.0 * 5 + 3.0 * 6) +- 1e-12
    got(1) shouldBe (0.5 * 2 - 1.5 * 2) +- 1e-12
  }

  test("DotProduct handles mixed float/double element types") {
    val df = Seq((Array(1.0f, 2.0f), Array(0.5, 0.25))).toDF("a", "b")
    df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head() shouldBe 1.0 +- 1e-12
  }

  test("DotProduct agrees with the aggregate(zip_with(...)) built-in formulation") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val builtin = aggregate(
      zip_with(transform(col("embedding"), x => x.cast("double")),
        transform(col("embedding"), x => x.cast("double")), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val diff = df.select(
      abs(VectorFunctions.dot(col("embedding"), col("embedding")) - builtin).as("d"))
      .agg(max("d")).as[Double].head()
    diff shouldBe 0.0 // identical accumulation order => bit-identical
  }

  test("DotProduct is null-safe (null array -> null result)") {
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    df.select(VectorFunctions.dot(col("a"), col("b"))).collect()(0).isNullAt(0) shouldBe true
  }

  test("cosine of identical vectors is 1") {
    val df = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
    df.select(VectorFunctions.cosine(col("v"), col("v"))).as[Double].head() shouldBe 1.0 +- 1e-12
  }

  test("ShingleHashes matches the built-in split/concat/xxhash64 formulation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val builtin = array_sort(array_distinct(transform(
      graft.operators.Dedup.shingles(col("text"), 2), s => xxhash64(s))))
    val mismatches = docs.select(
      (VectorFunctions.shingleHashes(col("text"), 2) =!= builtin).as("m"))
      .filter(col("m")).count()
    mismatches shouldBe 0
  }

  test("ShingleHashes: unigram, short text, sorted output") {
    val df = Seq("a b a c", "x", "").toDF("t")
    val rows = df.select(VectorFunctions.shingleHashes(col("t"), 2)).as[Seq[Long]].collect()
    rows(0).length shouldBe 3 // "a b", "b a", "a c"
    rows(0) shouldBe rows(0).sorted
    rows(1) shouldBe Seq.empty // fewer tokens than n
    val uni = df.select(VectorFunctions.shingleHashes(col("t"), 1)).as[Seq[Long]].collect()
    uni(0).length shouldBe 3 // distinct of a,b,a,c
    uni(1).length shouldBe 1
  }

  test("SortedIntersectSize counts overlap of sorted distinct arrays") {
    val df = Seq(
      (Array(1L, 3L, 5L, 7L), Array(3L, 4L, 5L, 6L, 7L)),
      (Array(1L, 2L), Array(3L, 4L)),
      (Array.empty[Long], Array(1L))
    ).toDF("a", "b")
    df.select(VectorFunctions.sortedIntersectSize(col("a"), col("b")))
      .as[Long].collect() shouldBe Array(3L, 0L, 0L)
  }

  test("SortedIntersectSize agrees with size(array_intersect) on real shingles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val a = docs.select(col("doc_id").as("ida"),
      VectorFunctions.shingleHashes(col("text"), 2).as("ha"))
    val b = docs.select(col("doc_id").as("idb"),
      VectorFunctions.shingleHashes(col("text"), 2).as("hb"))
    val pairs = a.crossJoin(b).limit(500)
    val diff = pairs.filter(
      VectorFunctions.sortedIntersectSize(col("ha"), col("hb")) =!=
        functions.size(array_intersect(col("ha"), col("hb"))).cast("long")).count()
    diff shouldBe 0
  }
}
