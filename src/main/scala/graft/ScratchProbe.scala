package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement harness — NOT part of the library surface.
  * Current probe: per-gate wall + executor-CPU for a named gate list
  * (`args(1)` comma-separated; default the pair-miner family), run
  * solo in one session — the dev loop for the r13 wall-gap work.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("dedup_ngram_jaccard", "dedup_components"))
    val cpu = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            cpu.addAndGet(te.taskMetrics.executorCpuTime)
      })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val c0 = cpu.get(); val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // listener drain
      val c = (cpu.get() - c0) / 1e9
      println(f"[probe] $name rows=$n wall=$w%.2f s cpu=$c%.1f s")
    }
    spark.stop()
  }
}
