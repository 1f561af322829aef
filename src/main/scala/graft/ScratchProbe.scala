package graft

import org.apache.spark.sql.SparkSession

/** Throwaway phase-timing probe (dev only, not part of the surface). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("scratch").getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.util.Tables.documents(spark, dir)
    def t[A](tag: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }
    t("warm-count")(docs.count())
    val p1 = t("jacc-1st")(graft.operators.Dedup.ngramJaccard(docs, 2, 0.5))
    t("jacc-1st-count")(p1.count())
    val p2 = t("jacc-2nd")(graft.operators.Dedup.ngramJaccard(docs, 2, 0.5))
    t("jacc-2nd-count")(p2.count())
    println(p2.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
