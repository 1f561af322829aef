package graft.util

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class LakeSpec extends SparkSuite with Matchers {
  import spark.implicits._

  test("date-partitioned write prunes partitions at scan time") {
    val path = Files.createTempDirectory("lake-part-").toFile.getAbsolutePath
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Lake.writeDatePartitioned(ev, "ts", path)

    val allDates = spark.read.parquet(path).select("p_date").distinct().count()
    allDates should be > 2L

    val oneDay = Lake.readDateRange(spark, path, "2024-01-02", "2024-01-02")
    val plan = oneDay.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    // pruned scan must not enumerate every partition
    val scanned = oneDay.select(input_file_name()).distinct().count()
    val totalFiles = spark.read.parquet(path).select(input_file_name()).distinct().count()
    scanned should be < totalFiles
    // correctness: same rows as a full-scan filter
    oneDay.count() shouldBe ev.filter(to_date(col("ts")) === "2024-01-02").count()
  }

  test("bucketed tables join and aggregate without an exchange on the bucket key") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    Lake.writeBucketed(ev, "lake_events_bkt", 4, "user_id")
    Lake.writeBucketed(ev.groupBy("user_id").agg(count(lit(1)).as("n")),
      "lake_users_bkt", 4, "user_id")

    val a = spark.table("lake_events_bkt")
    val b = spark.table("lake_users_bkt")
    // disable auto-broadcast so the only way to avoid a shuffle is the
    // bucket layout itself
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = a.join(b, "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      plan should not include "Exchange hashpartitioning"
      joined.count() shouldBe ev.count()

      val agg = a.groupBy("user_id").agg(sum("value"))
      agg.queryExecution.executedPlan.toString should not include "Exchange hashpartitioning"
      agg.count() shouldBe b.count()
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS lake_events_bkt")
      spark.sql("DROP TABLE IF EXISTS lake_users_bkt")
    }
  }
}
