package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement harness — NOT part of the library surface.
  * Current probe: isolated timings of the ngram pair operators at the
  * gate thresholds (4-CPU bench geometry), path visible via
  * GRAFT_PROBE snap lines (dense path snaps once, index path twice).
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def t[A](tag: String)(f: => A): A = {
      val s = System.nanoTime(); val c0 = osBean.getProcessCpuTime; val r = f
      println(f"[probe] $tag wall=${(System.nanoTime() - s) / 1e9}%.2f " +
        f"cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%.2f"); r
    }
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.util.Tables.documents(spark, dir)
    docs.count()
    import graft.operators.Dedup
    Dedup.ngramJaccard(docs, 2, 0.5).count() // warm
    for (round <- 1 to 1) {
      Dedup.denseOverlapCutoff = 1.0
      t(s"r$round auto  jacc-0.5")(Dedup.ngramJaccard(docs, 2, 0.5).count())
      t(s"r$round auto  cont-0.4")(Dedup.ngramContainment(docs, 2, 0.4).count())
      Dedup.denseOverlapCutoff = Double.MaxValue
      t(s"r$round index jacc-0.5")(Dedup.ngramJaccard(docs, 2, 0.5).count())
      t(s"r$round index cont-0.4")(Dedup.ngramContainment(docs, 2, 0.4).count())
      Dedup.denseOverlapCutoff = 0.0
      t(s"r$round dense jacc-0.5")(Dedup.ngramJaccard(docs, 2, 0.5).count())
      t(s"r$round dense cont-0.4")(Dedup.ngramContainment(docs, 2, 0.4).count())
      Dedup.denseOverlapCutoff = 1.0
    }
    spark.stop()
  }
}
