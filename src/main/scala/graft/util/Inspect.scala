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

  /** Per-column data profile — the table-health summary a lakehouse
    * inspector runs after every load (the natural extension of the
    * reference's `check_bronze.py` schema/count/sample surface): one
    * row per column with row count, null count, distinct count, and
    * string-rendered min/max.
    *
    * Shape: ONE aggregation row over the table (all per-column
    * aggregates together, map-side partials), then a `stack` unpivot
    * of that single row — the table is scanned once and nothing but
    * the 1×(4·cols) aggregate row moves. With `exactDistinct` the
    * multi-column distinct plans an Expand (rows × columns — the price
    * of exactness); `exactDistinct = false` switches to HyperLogLog
    * `approx_count_distinct`, which keeps the profile a single
    * narrow partial-aggregate pass — the 100 TB default.
    */
  def profile(df: DataFrame, exactDistinct: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val nd: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (exactDistinct) countDistinct(_) else approx_count_distinct(_)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        nd(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stacked = cols.map(c =>
      s"'$c', `__cnt_$c`, `__nd_$c`, `__min_$c`, `__max_$c`").mkString(", ")
    val types = map(cols.flatMap(c =>
      Seq(lit(c), lit(df.schema(c).dataType.simpleString))): _*)
    one.select(col("__rows"), expr(
        s"stack(${cols.length}, $stacked) AS " +
          "(column, __non_null, n_distinct, min_value, max_value)"))
      .select(col("column"),
        element_at(types, col("column")).as("data_type"),
        col("__rows").as("n_rows"),
        (col("__rows") - col("__non_null")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
