package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pca, Similarity, Dedup}
object ScratchIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val kd = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.util.Tables.embeddings(spark, dir)
    val cemb = Dedup.materialize(Similarity.clusteredCorpus(emb))
    val n = cemb.count()
    val (nl, _) = Similarity.scaledIvfConfig(n)
    val model = Pca.fit(cemb, kd)
    println("VAR ratio=" + model.varianceRatio)
    val proj = Pca.project(cemb, model, projCol = "embedding")
    val cents = Similarity.coarseCentroids(proj, nl, iters = 3)
    val queries = cemb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(cemb, queries, 10)
    val total = exact.count()
    val kth = exact.groupBy("query_id").agg(min(col("cos")).as("kth"))
    // tie structure: how many corpus vectors sit within eps of the kth cosine
    for (eps <- Seq(0.0, 0.0005, 0.001, 0.005)) {
      val ties = Similarity.bruteForceTopK(cemb, queries, 2000)
        .join(kth, "query_id").filter(col("cos") >= col("kth") - eps).count()
      println(s"TIES eps=$eps rows=$ties (queries=${kth.count()})")
    }
    for (nprobe <- Seq(16, 32); mult <- Seq(10, 30); eps <- Seq(0.0005, 0.001)) {
      val approx = Pca.pcaIvfTopK(cemb, queries, model, 10, nl, nprobe,
        coarseIters = 3, mult = mult, centsOpt = Some(cents))
      val hits = approx.join(kth, "query_id")
        .filter(col("cos") >= col("kth") - eps).count()
      println(s"RES n=$n kd=$kd nprobe=$nprobe mult=$mult eps=$eps epsRecall=${hits.toDouble/total}")
    }
    spark.stop()
  }
}
