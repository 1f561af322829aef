package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch inspection utilities — the engine-side equivalents of the
  * reference's `check_bronze.py` / `check_data.py` / `check_gold.py`
  * surface (SURVEY.md §2.9, §3.4): schema, volume, freshness, sample,
  * and commit history.
  *
  * `history` reads the file-sink `_spark_metadata` manifest — the
  * stand-in for Delta's `DeltaTable.history()` (`check_bronze.py:77-84`):
  * one row per committed file with its micro-batch id, commit time, and
  * action, reconstructing the append timeline of a streaming table.
  */
object Inspect {

  private val fileStatusSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("size", LongType),
    StructField("isDir", BooleanType),
    StructField("modificationTime", LongType),
    StructField("blockReplication", IntegerType),
    StructField("blockSize", LongType),
    StructField("action", StringType)))

  /** Commit history of a streaming file-sink table: (batch_id, path,
    * size, commit_ts, action), one row per file-commit, derived from
    * the `_spark_metadata` manifest log. Batch ids come from manifest
    * file names; compacted manifests replay the full retained history.
    *
    * The manifest files are read on the driver: Spark's file index
    * deliberately hides everything under `_spark_metadata` from
    * relational scans, and the log is KB-scale (compaction bounds it),
    * so a driver-side read is the right tool — parsing still runs
    * through the engine's JSON reader.
    */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val dir = new java.io.File(tablePath, "_spark_metadata")
    val manifests = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("[0-9]+(\\.compact)?"))
    val lines: Seq[(Long, String)] = manifests.toSeq.flatMap { f =>
      val batchId = f.getName.stripSuffix(".compact").toLong
      java.nio.file.Files.readAllLines(f.toPath).asScala
        .filter(l => l.nonEmpty && !l.startsWith("v"))
        .map(batchId -> _)
    }
    lines.toDF("batch_id", "value")
      .withColumn("entry", from_json(col("value"), fileStatusSchema))
      .select(col("batch_id"), col("entry.path").as("path"),
        col("entry.size").as("size"),
        timestamp_millis(col("entry.modificationTime")).as("commit_ts"),
        col("entry.action").as("action"))
  }

  /** Volume + schema summary (`check_bronze.py:56-62`). */
  def describe(df: DataFrame): (Long, String) = (df.count(), df.schema.treeString)

  /** Latest event per the given timestamp column (`check_data.py:35`). */
  def freshness(df: DataFrame, tsCol: String): Option[java.sql.Timestamp] =
    Option(df.agg(max(col(tsCol))).head().getTimestamp(0))

  /** Recent sample, newest first (`check_gold.py:16`). */
  def recentSample(df: DataFrame, tsCol: String, n: Int): Array[org.apache.spark.sql.Row] =
    df.orderBy(col(tsCol).desc).limit(n).collect()
}
