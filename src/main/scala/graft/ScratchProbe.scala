package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement harness — NOT part of the library surface.
  * Current probe: where text_heavy_ngrams' wall goes.
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
    t("heavy_store")(graft.SparkEntry.queries("text_heavy_store")(spark, dir).count())
    t("heavy_check")(graft.SparkEntry.queries("text_heavy_check")(spark, dir).count())
    t("q_heavy_hitters")(graft.SparkEntry.queries("q_heavy_hitters")(spark, dir).count())
    t("stream_heavy")(graft.SparkEntry.queries("stream_heavy_extend")(spark, dir).count())
    spark.stop()
  }
}
