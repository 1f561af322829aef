package graft.operators

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class RelationalSpec extends SparkSuite with Matchers {
  import spark.implicits._

  test("saltedJoin == plain join on heavily skewed data") {
    // 90% of fact rows share one hot key
    val fact = spark.range(0, 5000)
      .select(col("id"), when(col("id") % 10 < 9, 1L).otherwise(col("id") % 50).as("k"))
    val dim = spark.range(0, 50).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Relational.saltedJoin(fact, dim, "k", 8)
        .orderBy("id").select("id", "k", "name").collect()
      val plain = fact.join(dim, "k")
        .orderBy("id").select("id", "k", "name").collect()
      salted shouldBe plain
      // the join key actually includes the salt (skew is spread)
      val plan = Relational.saltedJoin(fact, dim, "k", 8)
        .queryExecution.executedPlan.toString
      plan should include("__salt")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("approximate aggregates track exact within tolerance (the 100 TB path)") {
    // percentile() sorts per group; approx_count_distinct/percentile_approx
    // are the sketch-based forms that don't - engine-specific output, so
    // they're tolerance-checked against exact here rather than
    // hash-checked against the oracle
    val ord = graft.util.Tables.orders(spark, "/root/testdata/sf0.01")
    val r = ord.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
      expr("percentile_approx(o_totalprice, 0.5, 1000)").as("approx_p50"),
      countDistinct(col("o_custkey")).as("exact_nd"),
      approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_nd")).head()
    val (ep, ap) = (r.getDouble(0), r.getDouble(1))
    math.abs(ap - ep) / ep should be < 0.02
    val (en, an) = (r.getLong(2), r.getLong(3))
    math.abs(an - en).toDouble / en should be < 0.05
  }

  test("aboveSegmentAverage: broadcast plan == Catalyst-decorrelated SQL plan") {
    val dir = "/root/testdata/sf0.01"
    val fast = Relational.aboveSegmentAverage(spark, dir)
      .orderBy("c_mktsegment").collect()
    val sql = Relational.aboveSegmentAverageSql(spark, dir)
      .orderBy("c_mktsegment").collect()
    fast shouldBe sql
    // the gated plan must broadcast the 5-row cutoff, not shuffle the
    // fact table on the 5-value segment key
    val df = Relational.aboveSegmentAverage(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString should include("BroadcastHashJoin")
  }

  test("orderValuePercentiles explicit interpolation == built-in percentile") {
    val dir = "/root/testdata/sf0.01"
    val explicitCents = Relational.orderValuePercentiles(spark, dir)
      .orderBy("c_mktsegment").collect()
    val cust = graft.util.Tables.customer(spark, dir)
    val builtin = graft.util.Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .orderBy("c_mktsegment").collect()
    explicitCents.length shouldBe builtin.length
    explicitCents.zip(builtin).foreach { case (e, b) =>
      e.getString(0) shouldBe b.getString(0)
      // explicit cents vs built-in double: equal to within rounding
      // (the built-in may differ in the final ulp — exactly why the
      // gated query spells the arithmetic out)
      (1 to 3).foreach { i =>
        math.abs(e.getLong(i) / 100.0 - b.getDouble(i)) should be < 0.011
      }
    }
  }

  test("saltedJoin preserves right-side multiplicity") {
    val fact = Seq((1L, "a"), (2L, "a")).toDF("id", "k")
    val dup = Seq(("a", "x"), ("a", "y")).toDF("k", "v")
    Relational.saltedJoin(fact, dup, "k", 4).count() shouldBe 4
  }
}
