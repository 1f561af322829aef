package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite
import graft.functions.{BloomHolder, BloomMightContainLong}

class BloomJoinSpec extends SparkSuite with Matchers {
  import spark.implicits._

  test("bloomPrefilterJoin equals the plain join and actually prunes the fact side") {
    val cust = graft.util.Tables.customer(spark, "/root/testdata/sf0.001")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val ord = graft.util.Tables.orders(spark, "/root/testdata/sf0.001")

    val viaBloom = Relational.bloomPrefilterJoin(ord, cust, "o_custkey", "c_custkey")
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    val plain = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name").orderBy("o_orderkey").collect()
    viaBloom shouldBe plain

    // the prefilter is a real reduction: with ~1/5 of customers in the
    // dim, far fewer fact rows survive than the full table (3% fpp
    // bounds the overshoot)
    val nKeys = math.max(cust.count(), 1L)
    val bloom = cust.stat.bloomFilter("c_custkey", nKeys, 0.03)
    val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
    val pre = ord.filter(ColumnBridge.column(BloomMightContainLong(
      ColumnBridge.expression(col("o_custkey")), new BloomHolder(bos.toByteArray))))
    pre.count().toDouble should be < ord.count() * 0.6
    pre.count() should be >= plain.length.toLong
  }

  test("membership errors are one-sided: every inserted key passes") {
    val keys = spark.range(0, 2000).select(col("id"))
    val bloom = keys.stat.bloomFilter("id", 2000, 0.03)
    val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
    val holder = new BloomHolder(bos.toByteArray)
    def passes(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(ColumnBridge.column(BloomMightContainLong(
        ColumnBridge.expression(col("id")), holder))).count()
    passes(keys.toDF()) shouldBe 2000L // zero false negatives, ever
    // and the false-positive rate on disjoint keys is near fpp
    val fp = passes(spark.range(1000000, 1020000).toDF())
    fp.toDouble / 20000 should be < 0.08
  }

  test("the membership test runs inside WholeStageCodegen") {
    val keys = spark.range(0, 100)
    val bloom = keys.stat.bloomFilter("id", 100, 0.03)
    val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
    val q = spark.range(0, 1000).filter(ColumnBridge.column(BloomMightContainLong(
      ColumnBridge.expression(col("id")), new BloomHolder(bos.toByteArray))))
    // `*(n)` prefixes mark operators compiled into WholeStageCodegen
    // stage n — the filter carries one, i.e. it is NOT an eval-mode
    // fallback breaking the span
    val plan = q.queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Filter graft_bloom_might_contain"""
    q.count() should be >= 100L
  }

  test("might-contain-ANY: array semantics, null handling, codegen") {
    import graft.functions.BloomMightContainAnyLong
    val keys = spark.range(0, 100)
    val bloom = keys.stat.bloomFilter("id", 100, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bloom.writeTo(bos)
    val holder = new BloomHolder(bos.toByteArray)
    def any(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.filter(ColumnBridge.column(BloomMightContainAnyLong(
        ColumnBridge.expression(col("a")), holder)))
    val rows = Seq(
      (1L, Seq[java.lang.Long](5L, 7L)),          // both in → true
      (2L, Seq[java.lang.Long](900000L, 42L)),    // one in → true
      (3L, Seq[java.lang.Long](900001L, 900002L)),// none in → (almost surely) false
      (4L, Seq[java.lang.Long](null, 13L)),       // null element skipped, hit after
      (5L, Seq.empty[java.lang.Long])             // empty → false
    ).toDF("doc_id", "a")
    any(rows).select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L, 4L)
    // null array yields null → filtered out, no NPE
    val withNull = rows.withColumn("a",
      when(col("doc_id") === 1L, lit(null)).otherwise(col("a")))
    any(withNull).select("doc_id").as[Long].collect().sorted shouldBe Array(2L, 4L)
    // the probe compiles into WholeStageCodegen (the local-relation
    // fold above exercised the interpreted eval path; a Range child
    // can't fold, so this plan exercises doGenCode)
    val ranged = spark.range(0, 1000)
      .select(array(col("id"), col("id") + 500000L).as("a"))
    val plan = any(ranged).queryExecution.executedPlan.toString
    plan should include regex """\*\(\d+\) Filter graft_bloom_might_contain_any"""
  }
}
