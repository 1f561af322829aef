import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.Files
object StreamProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val input = graft.util.Tables.events(spark, "/root/testdata/sf0.1")
    // reuse StreamedBatch chunking inline with progress capture
    val work = Files.createTempDirectory("sprof-").toFile
    val streamIn = new File(work, "in"); streamIn.mkdirs()
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))
    val stage = new File(work, "stage")
    input.withColumn("__chunk", ntile(3).over(w)).repartition(col("__chunk"))
      .write.partitionBy("__chunk").mode("overwrite").parquet(stage.getAbsolutePath)
    (1 to 3).foreach { i =>
      val part = new File(stage, s"__chunk=$i").listFiles().find(f => f.getName.startsWith("part-")).get
      val dst = new File(streamIn, f"chunk-$i%03d.parquet")
      Files.move(part.toPath, dst.toPath); dst.setLastModified(1000000000000L + i * 60000L)
    }
    val stream = spark.readStream.schema(input.schema).option("maxFilesPerTrigger", 1).parquet(streamIn.getAbsolutePath)
    val agg = graft.operators.Candles.ohlcv(stream.withWatermark("ts", "10 minutes"), tieCol = Some("event_id"))
    val q = agg.writeStream.format("parquet")
      .option("path", new File(work, "out").getAbsolutePath)
      .option("checkpointLocation", new File(work, "ckpt").getAbsolutePath)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"### batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      p.stateOperators.foreach(so => println(s"###   state: rowsTotal=${so.numRowsTotal} commitMs=${so.allUpdatesTimeMs}/${so.commitTimeMs}"))
    }
    spark.stop()
  }
}
