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
    // per-stage executor CPU/run/shuffle tallies (GRAFT_STAGES=1):
    // stage name carries the operator callsite, so sorting stages by
    // CPU is the "which subtree burns the gate" question answered
    // without the UI (the optimization-round dev loop)
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) {
            cpu.addAndGet(te.taskMetrics.executorCpuTime)
            stageAgg.merge(te.stageId,
              ("", te.taskMetrics.executorCpuTime,
                te.taskMetrics.executorRunTime,
                te.taskMetrics.shuffleWriteMetrics.bytesWritten,
                te.taskMetrics.shuffleReadMetrics.totalBytesRead),
              (a, b) => (a._1, a._2 + b._2, a._3 + b._3, a._4 + b._4,
                a._5 + b._5))
          }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stageAgg.merge(si.stageId, (si.name, 0L, 0L, 0L, 0L),
            (a, b) => (b._1, a._2, a._3, a._4, a._5))
        }
      })
    names.foreach { name =>
      stageAgg.clear()
      val fn = SparkEntry.queries(name)
      val c0 = cpu.get(); val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      val c = (cpu.get() - c0) / 1e9
      println(f"[probe] $name rows=$n wall=$w%.2f s cpu=$c%.1f s")
      if (sys.env.contains("GRAFT_STAGES")) {
        import scala.jdk.CollectionConverters._
        stageAgg.asScala.toSeq.sortBy(-_._2._2).take(20).foreach {
          case (sid, (nm, ct, rt, sw, sr)) =>
            println(f"[stage] $sid%5d cpu=${ct / 1e9}%7.2f s run=${rt / 1e3}%7.1f s " +
              f"swr=${sw / 1e6}%8.1f MB srd=${sr / 1e6}%8.1f MB  $nm")
        }
      }
    }
    spark.stop()
  }
}
