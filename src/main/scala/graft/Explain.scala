package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one `SparkEntry.queries` entry and print its
  * EXECUTED plan (post-AQE — a static explain of an un-executed AQE
  * plan shows no WholeStageCodegen nodes and placeholder exchanges,
  * which is a false signal for plan audits).
  *
  * Usage: runMain graft.Explain <queryName[,queryName...]> [sfDir] [outDir [suffix]]
  *
  * With `outDir`, additionally writes each query's
  * `.explain("formatted")` output (the optimization-round plan
  * artifact) to `outDir/<name>_<suffix>.txt` — formatted mode names
  * PushedFilters/ReadSchema per scan and numbers the operators, which
  * is what plan-diff claims are checked against.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(2)
    val suffix = args.lift(3).getOrElse("before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
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
      outDir.foreach { d =>
        val dir = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(dir)
        // formatted mode over the EXECUTED (post-AQE) plan
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
