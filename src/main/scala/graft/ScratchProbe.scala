package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway phase-timing probe (dev only, not part of the surface). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("scratch").getOrCreate()
    import graft.operators.Similarity
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = graft.util.Tables.embeddings(spark, s"/root/testdata/$sf")
      val n = emb.count()
      val (planes, bands) = Similarity.scaledLshConfig(n, targetOccupancy = 64)
      for (t <- Seq(0.4, 0.45, 0.5)) {
        val exact = Similarity.lshPairs(emb, t, numPlanes = 2, bands = 1)
        // numPlanes=2/bands=1 is nearly all-pairs? No — use brute force:
        val scaled = Similarity.lshPairsMultiProbe(emb, t,
          numPlanes = planes, bands = bands).count()
        val single = Similarity.lshPairs(emb, t,
          numPlanes = planes, bands = bands).count()
        val fixed = Similarity.lshPairs(emb, t, numPlanes = 32, bands = 16).count()
        println(s"[probe] $sf n=$n planes=$planes bands=$bands t=$t " +
          s"fixed32x16=$fixed scaledMulti=$scaled scaledSingle=$single")
      }
    }
    spark.stop()
  }
}
