package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one `SparkEntry.queries` entry and print its
  * EXECUTED plan (post-AQE — a static explain of an un-executed AQE
  * plan shows no WholeStageCodegen nodes and placeholder exchanges,
  * which is a false signal for plan audits).
  *
  * Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // execute THIS plan object: df.count() / df.write both wrap the
    // logical plan in a NEW QueryExecution, leaving this AQE root
    // un-finalized — the printed tree would be the initial,
    // pre-reoptimization plan with no reuse/codegen markers
    val plan = df.queryExecution.executedPlan
    val t0 = System.nanoTime()
    val n = plan.execute().count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"=== $name: $n rows in $sec%.2f s ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
