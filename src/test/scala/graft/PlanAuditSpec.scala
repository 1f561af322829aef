package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Pins that the global-window smell detector actually SEES the plan
  * under AQE: the executed plan's root is an `AdaptiveSparkPlanExec`
  * LEAF, so a naive `TreeNode.exists` returns false for every query
  * and the audit would be silently vacuous. The detector must recurse
  * through the AQE boundary.
  */
class PlanAuditSpec extends SparkSuite with Matchers {

  test("flags an empty-partition window through the AQE boundary") {
    val q = spark.range(100)
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    PlanAudit.hasGlobalWindow(q.queryExecution.executedPlan) shouldBe true
  }

  test("does not flag a key-partitioned window") {
    val q = spark.range(100)
      .withColumn("k", pmod(col("id"), lit(7)))
      .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("id")))
    PlanAudit.hasGlobalWindow(q.queryExecution.executedPlan) shouldBe false
  }

  test("does not flag a global single-row aggregate") {
    val q = spark.range(100).agg(sum("id"))
    PlanAudit.hasGlobalWindow(q.queryExecution.executedPlan) shouldBe false
  }
}
