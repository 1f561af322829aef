package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement harness — NOT part of the library surface.
  * Current probe: where dedup_components' CPU goes — jaccard input vs
  * closure, on the gate's exact composition at sf0.1.
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
    import graft.operators.Dedup
    t("warm jacc")(Dedup.ngramJaccard(docs, 2, 0.5).count())
    val jacc = t("jacc")(Dedup.ngramJaccard(docs, 2, 0.5))
    val base = java.nio.file.Files.createTempDirectory("probe").toString
    t("jacc-materialize")(
      jacc.select(col("doc_a"), col("doc_b")).write.parquet(s"$base/pairs"))
    val pairsSnap = spark.read.parquet(s"$base/pairs")
    t("closure-on-snap")(Dedup.dupComponents(pairsSnap).count())
    t("closure-on-snap-2nd")(Dedup.dupComponents(pairsSnap).count())
    t("gate-composed")(Dedup.dupComponents(
      Dedup.ngramJaccard(docs, 2, 0.5)).count())
    t("transitive-gate")(Dedup.dropTransitiveDups(docs,
      Dedup.ngramJaccard(docs, 2, 0.5)).count())
    spark.stop()
  }
}
