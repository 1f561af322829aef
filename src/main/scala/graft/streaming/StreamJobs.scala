package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming wiring for the medallion chain: durable
  * file-stream sources, exactly-once parquet append sinks, and the
  * three-query pipeline (SURVEY.md §2.8 T1-T9, §2.1 S1/S2, §2.2 K1).
  *
  * Source/sink substitution (SURVEY.md §7.0): the environment ships no
  * Kafka or Delta jars, so the durable buffer is a file-stream source
  * (JSON-lines or parquet) and the ACID append sink is Spark's file
  * sink, whose `_spark_metadata` manifest commits each epoch exactly
  * once — the same replayable, append-only, exactly-once guarantees the
  * reference gets from Kafka + Delta, behind the same operator surface.
  *
  * Scale notes: checkpointed offsets + manifest commits make every
  * query restartable mid-stream; state (gold's window aggregation)
  * lives in the state store keyed by `(window, symbol)` across
  * `spark.sql.shuffle.partitions` state partitions.
  */
object StreamJobs {

  /** JSON-lines file-stream source with an explicit schema (never
    * inferred — bronze is schema-on-read with a fixed envelope).
    * Mirrors the Kafka scan surface S1: `maxFilesPerTrigger` bounds a
    * micro-batch like `maxOffsetsPerTrigger`.
    */
  def jsonLinesStream(spark: SparkSession, path: String, schema: StructType,
                      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.json(path)
  }

  /** Parquet file-stream source — the stand-in for S2's "tail a Delta
    * table as a stream": new-files-only append tailing of a table dir.
    */
  def parquetStream(spark: SparkSession, path: String, schema: StructType,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.parquet(path)
  }

  /** Exactly-once parquet append sink (K1): file-sink manifest +
    * checkpointed offsets = each micro-batch commits once, survives
    * restart, and replays from t=0 when the checkpoint is removed.
    */
  def parquetAppend(df: DataFrame, path: String, checkpoint: String,
                    trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    df.writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Paths for one medallion deployment rooted at `root`. */
  final case class MedallionPaths(root: String) {
    val bronze = s"$root/delta/bronze"
    val silver = s"$root/delta/silver"
    val gold = s"$root/delta/gold"
    def checkpoint(layer: String) = s"$root/checkpoints/$layer"
  }

  /** The full pipeline as three concurrent streaming queries in ONE
    * SparkSession (the reference runs them as three OS processes,
    * `orchestration.py:35-51`; one session + three query handles is the
    * Spark-native equivalent — T9). Bronze/silver parquet tables are the
    * inter-query hand-off, exactly as the reference's Delta tables are.
    *
    * Returns the three running queries (bronze, silver, gold); callers
    * own their lifecycle (`processAllAvailable`/`awaitTermination`/
    * `stop`).
    */
  def runMedallion(spark: SparkSession, rawJsonDir: String, paths: MedallionPaths,
                   kafkaShapedSchema: StructType,
                   dedupDelay: Option[String] = Some("10 minutes"),
                   watermarkDelay: String = "10 minutes",
                   windowDur: String = "1 minute",
                   trigger: Trigger = Trigger.ProcessingTime(0)):
      (StreamingQuery, StreamingQuery, StreamingQuery) = {
    // the downstream file-stream sources tail these dirs before the
    // upstream query's first commit creates them
    Seq(paths.bronze, paths.silver, paths.gold)
      .foreach(p => new java.io.File(p).mkdirs())
    val raw = jsonLinesStream(spark, rawJsonDir, kafkaShapedSchema)
    val bronzeQ = parquetAppend(Medallion.bronzeEnvelope(raw),
      paths.bronze, paths.checkpoint("bronze"), trigger)
    val bronzeStream = parquetStream(spark, paths.bronze,
      graft.streaming.Schemas.bronze)
    val silverQ = parquetAppend(Medallion.silverTrades(bronzeStream, dedupDelay),
      paths.silver, paths.checkpoint("silver"), trigger)
    val silverStream = parquetStream(spark, paths.silver, graft.streaming.Schemas.silver)
    val goldQ = parquetAppend(Medallion.goldCandles(silverStream, watermarkDelay, windowDur),
      paths.gold, paths.checkpoint("gold"), trigger)
    (bronzeQ, silverQ, goldQ)
  }
}

/** Layer schemas (FIXTURES.md §2-§4; verified against the reference's
  * on-disk `_delta_log` metaData — SURVEY.md §1.2).
  */
object Schemas {
  import org.apache.spark.sql.types._

  /** Kafka-message shape feeding bronze (S1's projection surface). */
  val kafkaShaped: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("timestamp", TimestampType)))

  val bronze: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("json_payload", StringType),
    StructField("kafka_ts", TimestampType),
    StructField("ingest_ts", TimestampType)))

  val silver: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("price", DecimalType(18, 8)),
    StructField("trade_timestamp", TimestampType),
    StructField("trade_id", LongType),
    StructField("taker_side", StringType),
    StructField("last_size", DecimalType(18, 8)),
    StructField("silver_processed_at", TimestampType)))

  val gold: StructType = StructType(Seq(
    StructField("window_start", TimestampType),
    StructField("window_end", TimestampType),
    StructField("symbol", StringType),
    StructField("open", DecimalType(18, 8)),
    StructField("high", DecimalType(18, 8)),
    StructField("low", DecimalType(18, 8)),
    StructField("close", DecimalType(18, 8)),
    StructField("trade_count", LongType),
    StructField("vwap", DecimalType(22, 12)),
    StructField("gold_processed_at", TimestampType)))
}
