package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite
import graft.operators.Serving

class TopKPerKeySpec extends SparkSuite with Matchers {
  import spark.implicits._

  private lazy val events = graft.util.Tables.events(spark, "/root/testdata/sf0.001")

  private def viaWindow(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("topKPerKey returns exactly the window-formulation row set") {
    val fast = Serving.topKPerKey(events, 3, Seq("event_type"), Seq("ts", "event_id"))
    fast.count() shouldBe viaWindow(3).count()
    fast.orderBy("event_type", "event_id").collect() shouldBe
      viaWindow(3).orderBy("event_type", "event_id").collect()
  }

  test("physical plan: two heap phases, no Sort, one exchange") {
    val fast = Serving.topKPerKey(events, 5, Seq("event_type"), Seq("ts", "event_id"))
    fast.count() // materialize through AQE
    val plan = fast.queryExecution.executedPlan.toString
    // two phases: partial (pre-shuffle map-side combine) + final
    "TopKPerKey ".r.findAllIn(plan).length shouldBe 2
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
    plan should not include "Sort "
    plan should not include "Window"
  }

  test("result invariant under input partitioning") {
    val a = Serving.topKPerKey(events, 4, Seq("event_type"), Seq("ts", "event_id"))
      .orderBy("event_type", "event_id").collect()
    val b = Serving.topKPerKey(events.repartition(13), 4, Seq("event_type"), Seq("ts", "event_id"))
      .orderBy("event_type", "event_id").collect()
    a shouldBe b
  }

  test("k larger than group size returns whole groups") {
    val tiny = Seq((1L, 10L, "x"), (2L, 20L, "x"), (3L, 5L, "y"))
      .toDF("event_id", "ts", "event_type")
    Serving.topKPerKey(tiny, 10, Seq("event_type"), Seq("ts", "event_id"))
      .count() shouldBe 3
  }
}
