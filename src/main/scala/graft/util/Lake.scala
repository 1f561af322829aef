package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for lakehouse tables at scale: date
  * partitioning (partition pruning at scan time) and hash bucketing
  * (co-located, shuffle-free joins and aggregations on the bucket
  * key).
  *
  * At 100 TB these two layouts are what keep the medallion tables
  * queryable: gold/silver partitioned by event date means a dashboard
  * range query reads only its days (`PartitionFilters` in the scan,
  * not a full-table scan); bucketing the fact tables by their join key
  * means the recurring symbol/orderkey joins and aggregations skip the
  * exchange entirely — the shuffle was paid once at write time.
  */
object Lake {

  /** Write `df` partitioned by the DATE of `tsCol` (dynamic partition
    * dirs `p_date=YYYY-MM-DD`). Readers filtering on `p_date` scan
    * only matching partitions.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_date")
      .parquet(path)

  /** Read a date-partitioned table restricted to `[fromDate, toDate]`
    * (inclusive, ISO strings). The filter lands in the scan's
    * `PartitionFilters` — directories outside the range are never
    * listed into the plan.
    */
  def readDateRange(spark: SparkSession, path: String,
                    fromDate: String, toDate: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("p_date") >= lit(fromDate) && col("p_date") <= lit(toDate))

  /** Append a batch whose schema may have EVOLVED since the table was
    * created — the reference enables exactly this for its silver MERGE
    * writes (`spark.databricks.delta.schema.autoMerge.enabled=true`,
    * `process_silver.py:67`). Parquet is schema-on-read: each file
    * carries its own footer schema, so an append with extra columns
    * needs no table-level DDL and rewrites nothing.
    */
  def appendEvolving(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Read a table whose files were written under different schema
    * versions, merging every file footer into the union schema
    * (`mergeSchema=true` — the read half of Delta's schema auto-merge).
    * Columns missing from older files surface as NULL, exactly like
    * Delta after an additive evolution. Footer merging lists every
    * file's schema, so it is opt-in per read rather than session
    * default — at 100 TB only the schema-inference step pays, the scan
    * itself is unchanged.
    */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Compact a parquet table directory to approximately
    * `targetFileMB`-sized files — the small-files maintenance pass a
    * streaming lakehouse needs: micro-batch append sinks accrete one
    * file per (trigger × partition), and at 100 TB a scan over
    * millions of KB-sized files dies on open/seek overhead and
    * driver-side listing long before it reads any data. Delta's
    * OPTIMIZE is this operation; on plain parquet it is a
    * read → repartition → atomic-swap rewrite.
    *
    * The rewrite lands in a temp sibling dir first and swaps in via
    * rename, so readers never observe a half-written table. Returns
    * (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 128): (Int, Int) = {
    import java.io.File
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def parquetFiles(d: File): Array[File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val dir = new File(path)
    val before = parquetFiles(dir)
    val totalMB = math.max(before.map(_.length()).sum / (1024.0 * 1024.0), 0.001)
    val nFiles = math.max(1, math.ceil(totalMB / targetFileMB).toInt)
    val tmp = new File(dir.getParentFile, dir.getName + ".compact-tmp")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
    val bak = new File(dir.getParentFile, dir.getName + ".compact-old")
    Files.move(Paths.get(path), bak.toPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp.toPath, Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    bak.listFiles().foreach(_.delete()); bak.delete()
    (before.length, parquetFiles(new File(path)).length)
  }

  /** Persist `df` hash-bucketed (and sorted) by `keyCols` into the
    * session catalog as `tableName`. Joins and aggregations between
    * tables bucketed the same way on the same keys run without an
    * Exchange (verify: the join plan has no shuffle on the bucketed
    * side).
    */
  def writeBucketed(df: DataFrame, tableName: String, numBuckets: Int,
                    keyCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
