package graft

import org.apache.spark.sql.SparkSession

/** Scratch measurement harness — NOT part of the library surface.
  * Current probe: which gates THROW at sf0.1 (Bench used to swallow
  * exceptions silently, so a throwing gate's board line was cost
  * without an answer).
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
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, dir).count()
        if (n == 0) println(s"[probe] EMPTY $name")
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"[probe] THROWS $name: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(140)}")
      }
    }
    println(s"[probe] done, $bad gates throw at $dir")
    spark.stop()
  }
}
