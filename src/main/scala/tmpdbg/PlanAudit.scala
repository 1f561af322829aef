import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (name.startsWith("stream_")) {
        println(f"## $name%-28s (streaming replay - skipped static audit)")
      } else try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          if (plan.contains("CartesianProduct")) "CARTESIAN" else "",
          if (plan.contains("SortMergeJoin")) "SMJ" else "",
          if (plan.contains("BroadcastHashJoin")) "BHJ" else "",
          if (plan.contains("BroadcastNestedLoopJoin")) "BNLJ" else "",
          if (plan.contains("PushedFilters: []") && plan.contains("Filter")) "NO-PUSHDOWN" else "",
          if (!plan.contains("WholeStageCodegen")) "NO-WSCG" else "",
          if (plan.contains("Exchange")) "" else "NO-SHUFFLE"
        ).filter(_.nonEmpty).mkString(",")
        val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
        println(f"## $name%-28s exchanges=$nEx%2d  $flags")
      } catch { case e: Throwable => println(s"## $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
