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

  test("saltedJoin preserves right-side multiplicity") {
    val fact = Seq((1L, "a"), (2L, "a")).toDF("id", "k")
    val dup = Seq(("a", "x"), ("a", "y")).toDF("k", "v")
    Relational.saltedJoin(fact, dup, "k", 4).count() shouldBe 4
  }
}
