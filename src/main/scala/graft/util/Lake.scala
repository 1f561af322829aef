package graft.util

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
    * batch lakehouse needs: repeated appends accrete one file per
    * (job × partition), and at 100 TB a scan over millions of KB-sized
    * files dies on open/seek overhead and driver-side listing long
    * before it reads any data. Delta's OPTIMIZE is this operation; on
    * plain parquet it is a read → repartition → swap rewrite.
    *
    * Supported layouts:
    *  - flat batch dirs (parquet files at the top level);
    *  - Hive-partitioned dirs (`k=v` subdirectories, nested OK) — the
    *    rewrite preserves the partition columns and directory layout,
    *    so partition pruning keeps working, with rows hash-clustered by
    *    partition key so each partition value lands in ~one file. A
    *    partition value larger than `targetFileMB` stays a single file
    *    (the MB target is honored at whole-table granularity).
    *
    * REFUSED (throws `IllegalArgumentException`, table untouched):
    * dirs containing a `_spark_metadata` streaming-sink manifest.
    * Rewriting such a dir is silent data loss waiting to happen — the
    * rewrite would drop the sink manifest, and a stream resuming on its
    * old checkpoint recreates `_spark_metadata` listing only post-resume
    * files, at which point every compacted row becomes invisible to
    * `spark.read.parquet` (manifest-listed dirs ignore foreign files).
    * To compact a retired streaming sink, read it and write a NEW table
    * (`spark.read.parquet(sink).repartition(n).write.parquet(other)`),
    * leaving the sink dir and its manifest intact.
    *
    * Concurrency contract: callers must ensure no writer is active and
    * no reader starts a scan during the swap — the rewrite lands in a
    * temp sibling dir first, but the swap is two renames, and between
    * them the table path briefly does not exist (a concurrent reader
    * would throw PATH_NOT_FOUND; none can ever see a half-written
    * table). Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String, targetFileMB: Int = 128): (Int, Int) =
    rewriteTable(spark, path, targetFileMB) { (df, nFiles, partCols) =>
      if (partCols.isEmpty) df.repartition(nFiles)
      // hash-cluster by partition key: every row of one partition value
      // lands in one task, so the dynamic write emits ~one file per
      // partition dir instead of (tasks × partitions)
      else df.repartition(nFiles, partCols.map(col): _*)
    }

  /** [[compact]] plus multi-dimensional data CLUSTERING — Delta's
    * `OPTIMIZE ... ZORDER BY` on plain parquet. Rows are ordered along
    * a Z-order (Morton) curve over `clusterCols` before the rewrite, so
    * each output file covers a small hyper-rectangle of the cluster-key
    * space and its parquet footer min/max stats are NARROW on every
    * clustered column at once. A scan filtering on any of them then
    * skips most files (row-group stats pruning) — at 100 TB this is the
    * difference between reading a table and reading a few files, for
    * predicates on columns the partition layout doesn't cover.
    *
    * Mechanics (all distributed, codegen'd — no UDF, no driver loop):
    * each cluster column is rank-bucketed to `zBits` bits against its
    * own approx-quantile boundaries (a bounded driver-side array, the
    * only collect), the per-column buckets are bit-interleaved into one
    * Z-value expression, and the rewrite range-partitions + sorts by
    * it. Quantile bucketing (not min/max scaling) keeps the curve
    * balanced under skew: every bucket holds ~1/2^zBits of the rows.
    *
    * Same refusals, swap, and concurrency contract as [[compact]]; in a
    * Hive-partitioned layout rows cluster within each partition.
    */
  def compactClustered(spark: SparkSession, path: String,
                       clusterCols: Seq[String], targetFileMB: Int = 128,
                       zBits: Int = 8): (Int, Int) = {
    require(clusterCols.nonEmpty, "compactClustered: no cluster columns")
    rewriteTable(spark, path, targetFileMB) { (df, nFiles, partCols) =>
      val z = zValue(df, clusterCols, zBits)
      val keys = partCols.map(col) :+ z
      df.repartitionByRange(nFiles, keys: _*)
        .sortWithinPartitions(keys: _*)
    }
  }

  /** The Z-order (Morton) key of `clusterCols` as one codegen'd column:
    * per column, `size(filter(boundaries, b -> b <= x))` ranks `x`
    * into its quantile bucket (boundaries are an array LITERAL — the
    * 2^zBits-point quantile sketch is the only driver-side data); the
    * bucket bits then interleave across columns, column `j` owning bit
    * positions `i*n + j`. NULLs rank into bucket 0 (they sort first,
    * as in an ORDER BY).
    */
  private def zValue(df: DataFrame, clusterCols: Seq[String], zBits: Int): Column = {
    val n = clusterCols.length
    // interleaved key width must fit a signed long (shift past bit 62
    // would alias mod-64 and silently scramble the curve)
    require(zBits * n <= 62,
      s"compactClustered: zBits=$zBits × ${n} columns needs ${zBits * n} " +
        "interleaved bits; reduce zBits to fit 62")
    val nBuckets = 1 << zBits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    // ONE sketch pass for all cluster columns (the per-column overload
    // would rescan the table per column)
    val allBounds = df.stat.approxQuantile(clusterCols.toArray, probs, 0.001)
    val buckets = clusterCols.zip(allBounds).map { case (c, bs) =>
      val arr = array(bs.distinct.sorted.map(lit): _*)
      when(col(c).isNull, lit(0L))
        .otherwise(size(filter(arr, b => b <= col(c).cast("double"))).cast("long"))
    }
    val terms = for {
      i <- 0 until zBits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(1L), i * n + j)
    terms.reduce(_.bitwiseOR(_)).as("__zorder")
  }

  /** Shared rewrite-and-swap skeleton of [[compact]] /
    * [[compactClustered]]: layout detection, streaming-sink refusal,
    * temp-dir rewrite, atomic two-rename swap, recursive backup delete.
    */
  private def rewriteTable(spark: SparkSession, path: String, targetFileMB: Int)
                          (shape: (DataFrame, Int, Seq[String]) => DataFrame): (Int, Int) = {
    import java.io.File
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // visible children only: dot/underscore names (_SUCCESS, .crc) are
    // metadata to Spark's file index and to us
    def visible(d: File): Array[File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    def parquetFiles(d: File): Array[File] = {
      val kids = visible(d)
      kids.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(parquetFiles)
    }
    def deleteRecursively(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
      f.delete()
    }
    val dir = new File(path)
    require(dir.isDirectory, s"compact: not a table directory: $path")
    // a manifest-managed store references its data files BY NAME in
    // committed generations; rewriting them in place severs every
    // manifest (readers hit PATH_NOT_FOUND) — that maintenance pass is
    // Manifest.compactSub, which appends the rewrite and swaps the
    // file list in a new commit instead
    // walk EVERY ancestor: a nested sub-path (codes/cell=3, ...) of a
    // managed store must be refused too, not just the store root's
    // immediate children
    val managedAncestor = Iterator.iterate(Option(dir))(_.flatMap(d =>
        Option(d.getParentFile)))
      .takeWhile(_.isDefined).flatten
      .exists(d => new File(d, "_meta").exists())
    require(!managedAncestor,
      s"compact: $path belongs to a manifest-managed store (_meta " +
        "present on an ancestor); use graft.util.Manifest.compactSub, " +
        "which compacts through a generation commit instead of " +
        "rewriting referenced files in place")
    require(!new File(dir, "_spark_metadata").exists(),
      s"compact: $path is a streaming file-sink table (_spark_metadata " +
        "present); compacting it would drop the sink manifest and a " +
        "resumed stream would make every compacted row invisible to " +
        "readers. Stop the stream for good and rewrite to a NEW path " +
        "instead.")
    // partition columns: walk the first chain of k=v subdirectories
    // (Hive layout nests one level per partition column)
    val partCols = Iterator.iterate(Option(dir)) {
      _.flatMap(d => visible(d).find(f => f.isDirectory && f.getName.contains("=")))
    }.drop(1).takeWhile(_.isDefined).flatten
      .map(_.getName.split("=", 2)(0)).toSeq
    val before = parquetFiles(dir)
    val totalMB = math.max(before.map(_.length()).sum / (1024.0 * 1024.0), 0.001)
    val nFiles = math.max(1, math.ceil(totalMB / targetFileMB).toInt)
    val tmp = new File(dir.getParentFile, dir.getName + ".compact-tmp")
    val df = spark.read.parquet(path)
    val w = shape(df, nFiles, partCols).write.mode(SaveMode.Overwrite)
    (if (partCols.isEmpty) w else w.partitionBy(partCols: _*))
      .parquet(tmp.getAbsolutePath)
    val bak = new File(dir.getParentFile, dir.getName + ".compact-old")
    Files.move(Paths.get(path), bak.toPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp.toPath, Paths.get(path), StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(bak)
    (before.length, parquetFiles(new File(path)).length)
  }

  // ── file-level stats index (data skipping) ────────────────────────
  //
  // Delta/Iceberg keep per-file column min/max in their transaction
  // log and prune FILES from a scan before any footer is opened —
  // "data skipping". Plain parquet only prunes ROW GROUPS, and only
  // after paying an open+footer-read per file; at 100 TB with
  // millions of files the opens dominate a selective query. This is
  // the same observation behind Z-ordering ([[compactClustered]]):
  // clustering makes per-file ranges NARROW, the stats index is what
  // lets the planner USE those ranges without touching the files.
  //
  // The manifest is one tiny parquet table under `path/_filestats`
  // (underscore → invisible to Spark's file index on the data dir):
  // one row per data file with min/max per indexed column. One scan
  // builds it (a groupBy on `_metadata.file_path` — Spark's file
  // source exposes provenance without any UDF), and the skipping
  // reader collects only the manifest (bounded by FILE COUNT, the
  // same cardinality every Delta reader holds) to compute the
  // surviving file list.

  private def statsPath(path: String) = s"$path/_filestats"

  /** Build (or rebuild) the per-file min/max manifest for `statsCols`
    * over the parquet table at `path`. One distributed scan; the
    * manifest is ~one row per data file. Returns the file count.
    *
    * Staleness contract: the manifest describes the files present at
    * build time. [[readSkipping]] re-checks the live listing and
    * REFUSES (throws) if data files exist that the manifest does not
    * cover — an append without a rebuild fails loudly instead of
    * silently dropping rows. (Delta avoids the race by committing
    * stats and files in one log entry; on plain parquet rebuild-after-
    * append is the contract, and the guard is what makes forgetting it
    * an error rather than wrong answers.)
    */
  def buildFileStats(spark: SparkSession, path: String,
                     statsCols: Seq[String]): Long = {
    require(statsCols.nonEmpty, "buildFileStats: no stats columns")
    val df = spark.read.parquet(path)
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    }
    val stats = df
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(aggs.head, aggs.tail: _*)
    stats.coalesce(1).write.mode(SaveMode.Overwrite).parquet(statsPath(path))
    spark.read.parquet(statsPath(path)).count()
  }

  /** Read `path` restricted to `lo <= predCol <= hi`, pruning whole
    * FILES via the [[buildFileStats]] manifest before the scan: a file
    * whose `[min, max]` range misses `[lo, hi]` is never opened. The
    * residual predicate is still applied row-level (file ranges
    * overlap the bounds, they don't prove membership). Files whose
    * min/max are NULL (every row's `predCol` is NULL) are pruned —
    * range predicates never match NULL.
    *
    * Throws if the manifest is missing or stale (live data files not
    * covered by the manifest — see the staleness contract above).
    *
    * Scope: flat table layouts (the [[compactClustered]] target).
    * Hive-partitioned layouts skip at the directory level through
    * `PartitionFilters` already; per-file skipping composes with that
    * by running this reader per partition directory.
    */
  def readSkipping(spark: SparkSession, path: String, predCol: String,
                   lo: Column, hi: Column): DataFrame =
    readPruned(spark, path,
      keep = !(col(s"max_$predCol") < lo || col(s"min_$predCol") > hi),
      pred = col(predCol) >= lo && col(predCol) <= hi)

  /** [[readSkipping]] for a VALUE SET: keep files whose `[min, max]`
    * range covers at least one probed value — the posting-list /
    * point-lookup shape (`predCol IN (...)`). With values range-laid-
    * out ([[compactClustered]] or a range-partitioned write), the
    * surviving files track the probe's selectivity, not the table.
    */
  def readSkippingIn(spark: SparkSession, path: String, predCol: String,
                     values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "readSkippingIn: no probe values")
    val vs = values.distinct
    readPruned(spark, path,
      keep = vs.map(v =>
        col(s"min_$predCol") <= lit(v) && lit(v) <= col(s"max_$predCol"))
        .reduce(_ || _),
      pred = col(predCol).isin(vs: _*))
  }

  /** Shared skipping core: evaluate `keep` over the manifest, verify
    * coverage of the live listing (staleness guard), scan only
    * surviving files, apply the residual row predicate. Driver state
    * is one (path, boolean) per data file — the same cardinality any
    * parquet scan's file index already holds for the listing.
    */
  private def readPruned(spark: SparkSession, path: String,
                         keep: Column, pred: Column): DataFrame = {
    val sp = new org.apache.hadoop.fs.Path(statsPath(path))
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(sp),
      s"readSkipping: no _filestats manifest at $path; run buildFileStats first")
    val files = spark.read.parquet(statsPath(path))
      .select(col("file_path"), keep.as("keep"))
      .collect().map(r => (r.getString(0), !r.isNullAt(1) && r.getBoolean(1)))
    val covered = files.map(_._1.replaceFirst("^file:", "")).toSet
    val live = listDataFiles(new java.io.File(path))
    val stale = live.filterNot(f => covered.contains(f.getAbsolutePath))
    require(stale.isEmpty,
      s"readSkipping: manifest at $path is STALE — ${stale.length} data " +
        s"file(s) not covered (e.g. ${stale.head.getName}); rebuild with " +
        "buildFileStats after appends")
    val keepFiles = files.collect { case (f, true) => f }
    if (keepFiles.isEmpty)
      spark.read.parquet(path).filter(pred).filter(lit(false))
    else
      spark.read.parquet(keepFiles: _*).filter(pred)
  }

  /** Visible `.parquet` files under `dir`, recursively (shared with
    * the compaction file census; dot/underscore names are metadata).
    */
  private def listDataFiles(dir: java.io.File): Array[java.io.File] = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    kids.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
      kids.filter(_.isDirectory).flatMap(listDataFiles)
  }

  // ── applied-shard ledger ──────────────────────────────────────────
  //
  // The Delta `txn` action's idempotent-writer dedup on plain parquet:
  // an append-only index (near-dup sets/buckets, span hashes, ANN
  // codes) that re-applies a shard after a retry duplicates rows —
  // which at best wastes space (span hashes) and at worst corrupts
  // answers (duplicated shingle sets fan out verification joins). A
  // tiny `_applied/` parquet table under the index path records shard
  // ids; extends carrying an id skip seen shards. The underscore
  // prefix keeps the ledger invisible to Spark's file index on the
  // surrounding data dirs. One row appended per shard — a bounded,
  // driver-cheap read.
  //
  // GUARANTEE SCOPE: the ledger row is appended AFTER a shard's data
  // appends complete, so it makes RE-DELIVERY of a COMPLETED extend a
  // no-op (the streaming/driver redelivery case — foreachBatch retries,
  // at-least-once upstreams). It does NOT make a crash MID-extend
  // retryable: a failure after some appends but before `recordApplied`
  // leaves partial shard rows that a blind retry would double. Recovery
  // from a mid-extend crash is: drop the shard's partial files (parquet
  // task files are attributable by write time / `_temporary` residue)
  // or rebuild the store. The candle store ([[graft.operators.Candles]])
  // closes this window properly — its ledger commits atomically inside
  // the manifest, the pattern to mirror where mid-write crash coverage
  // is required.

  private def appliedPath(path: String) = s"$path/_applied"

  /** Shard ids already recorded under `path` (empty when no ledger). */
  def appliedShards(spark: SparkSession, path: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(appliedPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(appliedPath(path)).collect().map(_.getString(0)).toSet
  }

  /** Drop the ledger — a store REBUILD starts a new epoch: the old
    * ledger's batch/shard ids must not turn the new epoch's extends
    * into silent no-ops (a replayed stream re-numbers its batches from
    * 0, and a rebuilt store owes every one of them a write).
    */
  def clearApplied(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(appliedPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Record one applied shard id (parquet append of one tiny file). */
  def recordApplied(spark: SparkSession, path: String, shardId: String): Unit = {
    import spark.implicits._
    Seq(shardId).toDF("shard_id").coalesce(1)
      .write.mode(SaveMode.Append).parquet(appliedPath(path))
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

  // ── MERGE INTO: keyed upsert on a manifest-managed table ──────────
  //
  // Delta's `MERGE INTO target USING updates ON keys WHEN MATCHED THEN
  // UPDATE SET * WHEN NOT MATCHED THEN INSERT *` — the canonical
  // upsert of the Delta table surface the reference's medallion writes
  // to (its own jobs append; MERGE is what that surface offers the
  // moment a pipeline needs keyed updates) — implemented Delta's way
  // on plain parquet:
  // only the FILES that contain matched keys are rewritten, everything
  // else survives the commit untouched on disk, and the swap is one
  // atomic [[Manifest]] generation (snapshot isolation + time travel
  // included). Matched-file discovery is two-stage, exactly the
  // data-skipping shape a 100 TB merge needs:
  //  1. per-file key min/max stats (committed WITH the data in the
  //     same generation — no stale-stats window) prune to candidate
  //     files whose range overlaps the updates' key range;
  //  2. an exact key semi-join, column-pruned to the key columns,
  //     over ONLY the candidate files yields the touched set.
  // A merge whose updates land in a narrow key range therefore scans
  // the key column of a few files and rewrites only those — never the
  // table.
  //
  // Contracts: single writer (Manifest's rule); `updates` must be
  // key-unique (Delta's multiple-source-rows error, enforced);
  // the target stays key-unique provided [[mergeInit]]'s input was.

  private val MergeDataSub = "data"
  private val MergeStatsSub = "stats"

  /** Outcome of one [[merge]]: row counts and the file-pruning
    * funnel (`filesLive` ≥ `filesCandidate` ≥ `filesRewritten`).
    */
  case class MergeResult(matched: Long, inserted: Long,
                         filesRewritten: Int, filesCandidate: Int,
                         filesLive: Int, deleted: Long = 0L,
                         applied: Boolean)

  /** Per-file key min/max stats for EXACTLY `names` (data-sub file
    * names): the explicit list left-joins the aggregated mins/maxes,
    * so a ZERO-ROW file (an empty write partition — skewed
    * repartitions produce them) still gets a covering row with null
    * stats. Null stats are correct: the overlap predicate evaluates
    * null → the file is never a candidate (no key can match), yet the
    * coverage guard holds.
    */
  /** `dataDir` overrides where the named files are READ from (the
    * transaction-staging dir during a rewrite — file NAMES are stable
    * across the staging move, so stats computed pre-publish stay
    * valid); default is the table's live data sub.
    */
  private[graft] def mergeStatsFor(spark: SparkSession, path: String,
                            names: Set[String], keys: Seq[String],
                            dataDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val dir = dataDir.getOrElse(s"$path/$MergeDataSub")
    val aggs = keys.flatMap { k =>
      Seq(min(col(k)).as(s"min_$k"), max(col(k)).as(s"max_$k"))
    }
    val agg = spark.read.option("basePath", dir)
      .parquet(names.toSeq.map(n => s"$dir/$n"): _*)
      .groupBy(col("_metadata.file_name").as("file_name"))
      .agg(aggs.head, aggs.tail: _*)
    names.toSeq.toDF("file_name").join(agg, Seq("file_name"), "left")
  }

  private[graft] def dataFileNames(spark: SparkSession, path: String): Set[String] =
    fileNamesIn(spark, s"$path/$MergeDataSub")

  /** Visible file names directly under `dir` (empty when absent). */
  private def fileNamesIn(spark: SparkSession, dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filter(n => !n.startsWith(".") && !n.startsWith("_")).toSet
  }

  /** Create the merge-managed table at `path` from `df` (generation 0:
    * data + its per-file key stats in one commit). `df` should be
    * key-unique on `keys` — merges preserve that invariant, they don't
    * create it. `shardId` lands in generation 0's ledger, so a
    * replayed build (e.g. a streaming sink's batch 0 re-run after the
    * table already exists) can prove itself already-applied instead of
    * re-clearing the table.
    */
  def mergeInit(spark: SparkSession, path: String, df: DataFrame,
                keys: Seq[String], shardId: Option[String] = None): Unit = {
    require(keys.nonEmpty && keys.forall(df.columns.contains),
      s"mergeInit: keys ${keys.mkString(",")} must exist in the frame")
    Manifest.init(spark, path, shardId.toSet) {
      df.write.mode(SaveMode.Overwrite).parquet(s"$path/$MergeDataSub")
      mergeStatsFor(spark, path, dataFileNames(spark, path), keys)
        .coalesce(1).write.mode(SaveMode.Append)
        .parquet(s"$path/$MergeStatsSub")
    }
  }

  /** The table's current (or `asOf`) committed rows. Footer schemas
    * are merged so a table that went through an additive MERGE
    * evolution ([[merge]]'s `evolve`) surfaces the union schema —
    * files written before the evolution read the new columns as NULL,
    * exactly like Delta after `autoMerge` widens a table.
    */
  def mergeRead(spark: SparkSession, path: String,
                asOf: Option[Int] = None): DataFrame =
    Manifest.read(spark, path, MergeDataSub, asOf, mergeSchema = true)

  /** Upsert `updates` into the table at `path` by `keys` (see section
    * comment for semantics and the two-stage file pruning). `shardId`
    * makes re-delivery a no-op through the manifest ledger. Returns
    * the [[MergeResult]] funnel; `applied = false` is the ledger
    * no-op (nothing was computed or written).
    *
    * `evolve = true` is Delta's
    * `spark.databricks.delta.schema.autoMerge` for MERGE (the setting
    * the reference enables, `process_silver.py:67`): updates may carry
    * ADDITIONAL columns, which widen the table atomically in the same
    * commit — rewritten survivors carry NULL for them, untouched files
    * keep their old footers and read as NULL through [[mergeRead]]'s
    * schema merge. Still refused either way: a missing target column
    * or a type change on a shared column (only ADDITIVE evolution is
    * sound — Delta refuses the same).
    */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
            keys: Seq[String], shardId: Option[String] = None,
            retain: Int = 3, evolve: Boolean = false): MergeResult =
    upsertCore(spark, path, updates, None, keys, shardId, retain, evolve)

  /** Delta Live Tables' `APPLY CHANGES INTO`: one keyed change batch
    * with an operation column — rows whose `opCol` equals `deleteOp`
    * REMOVE their key, every other row upserts — applied as ONE atomic
    * generation (a CDC feed's delete and upsert halves never tear).
    * The batch must be key-unique across BOTH halves (one operation
    * per key per batch — resolve op precedence upstream). Same
    * two-stage file pruning as [[merge]]; `deleted` in the result
    * counts target rows actually removed.
    */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
                   keys: Seq[String], opCol: String, deleteOp: String = "D",
                   shardId: Option[String] = None,
                   retain: Int = 3): MergeResult = {
    require(changes.columns.contains(opCol),
      s"applyChanges: operation column $opCol missing from the batch")
    val ups = changes.filter(col(opCol) =!= deleteOp).drop(opCol)
    val delKeys = changes.filter(col(opCol) === deleteOp)
      .select(keys.map(col): _*).distinct()
    upsertCore(spark, path, ups, Some(delKeys), keys, shardId, retain)
  }

  /** Shared MERGE/APPLY-CHANGES core: upsert `updates` and (when
    * given) remove `delKeysOpt`'s keys, as one commit.
    */
  private def upsertCore(spark: SparkSession, path: String,
                         updatesIn: DataFrame, delKeysOpt: Option[DataFrame],
                         keys: Seq[String], shardId: Option[String],
                         retain: Int, evolve: Boolean = false): MergeResult = {
    val snap = Manifest.snapshot(spark, path)
    if (shardId.exists(snap.applied))
      return MergeResult(0, 0, 0, 0,
        snap.files.count(_.startsWith(s"$MergeDataSub/")), applied = false)
    // generated columns first: missing ones are computed (the shape
    // check below then sees the full schema), provided ones verified
    val updates = applyGenerated(spark, path, updatesIn)
    val target = mergeRead(spark, path)
    // names AND types: a name-only check would let an int32-keyed
    // update append files next to int64 ones — a commit that succeeds
    // and poisons every later read (Delta refuses up front; so do we).
    // With evolve, updates may carry EXTRA columns (the additive
    // widening); every target column must still be present and
    // type-identical — a dropped column or a type change is refused in
    // both modes, exactly Delta's autoMerge rules.
    def shape(df: DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1)
    if (!evolve)
      require(shape(updates).sameElements(shape(target)),
        s"merge: updates schema ${shape(updates).mkString(",")} != " +
          s"target ${shape(target).mkString(",")} (pass evolve = true to " +
          "widen the table with additional update columns)")
    else {
      val uTypes = updates.schema.fields.map(f => f.name -> f.dataType).toMap
      val missing = target.schema.fields.filterNot(f => uTypes.contains(f.name))
      require(missing.isEmpty,
        s"merge(evolve): updates are missing target column(s) " +
          s"${missing.map(_.name).mkString(",")} — evolution is additive " +
          "only; dropped columns are refused")
      val drifted = target.schema.fields
        .filter(f => uTypes(f.name) != f.dataType)
      require(drifted.isEmpty,
        s"merge(evolve): type change on shared column(s) " +
          drifted.map(f => s"${f.name}: ${f.dataType} -> ${uTypes(f.name)}")
            .mkString(",") + " — only additive evolution is sound")
    }
    // output schema: target's column order, plus (under evolve) the
    // new update columns appended — the widened table schema
    val outCols: Seq[String] =
      if (!evolve) target.columns.toSeq
      else target.columns.toSeq ++
        updates.columns.filterNot(target.columns.contains)
    require(keys.nonEmpty && keys.forall(updates.columns.contains),
      s"merge: keys ${keys.mkString(",")} must exist in updates")
    // pin the (possibly expensive, caller-derived) source plan: the
    // merge runs ~6 actions over it — counts, the key-range agg, the
    // touch test, the survivors anti-join, the write — and each would
    // otherwise recompute it from scratch (Delta materializes the
    // merge source for the same reason)
    updates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val nUpd = updates.count()
    val updKeys = updates.select(keys.map(col): _*).distinct()
    if (updKeys.count() != nUpd)
      throw new IllegalArgumentException(
        "merge: updates carry multiple rows for the same key — ambiguous " +
          "upsert (Delta's multiple-source-rows error); dedup the source first")
    // table-level CHECK constraints gate every incoming row BEFORE any
    // commit machinery starts — a refusal leaves the table untouched
    enforceConstraints(spark, path, updates, "merge")
    // ALL keys whose target rows leave their files: upserted + deleted.
    // A key in both halves is ambiguous (which op wins?) — refuse.
    val allKeys = delKeysOpt match {
      case None => updKeys
      case Some(d) =>
        if (updKeys.join(d, keys, "left_semi").count() > 0)
          throw new IllegalArgumentException(
            "applyChanges: a key carries both an upsert and a delete in one " +
              "batch — resolve operation precedence upstream")
        updKeys.unionByName(d).distinct()
    }
    val liveData = snap.files.filter(_.startsWith(s"$MergeDataSub/"))
    val liveStats = snap.files.filter(_.startsWith(s"$MergeStatsSub/"))
    // stage 1: candidates by stats-range overlap (driver state: two
    // scalars per key column + one boolean per live file)
    val rangeAggs = keys.flatMap(k => Seq(min(col(k)), max(col(k))))
    val rangeRow = allKeys.agg(rangeAggs.head, rangeAggs.tail: _*).head()
    val overlap = keys.zipWithIndex.map { case (k, i) =>
      val (lo, hi) = (rangeRow.get(2 * i), rangeRow.get(2 * i + 1))
      if (lo == null) lit(false)
      else !(col(s"max_$k") < lit(lo) || col(s"min_$k") > lit(hi))
    }.reduce(_ && _)
    val candNames = statsCovering(spark, path, liveData, None)
      .filter(overlap).select("file_name")
      .collect().map(_.getString(0)).toSet
    val candRel = liveData.filter(f => candNames.contains(f.split('/').last))
    // stage 2: exact touch test, column-pruned to the keys, candidate
    // files only (mergeSchema: touched files may straddle an additive
    // evolution)
    def readFiles(rel: Seq[String]): DataFrame =
      spark.read.option("basePath", s"$path/$MergeDataSub")
        .option("mergeSchema", "true")
        .parquet(rel.map(f => s"$path/$f"): _*)
    val touchedNames: Set[String] =
      if (candRel.isEmpty) Set.empty
      else readFiles(candRel)
        .select(col("_metadata.file_name").as("__file") +: keys.map(col): _*)
        .join(allKeys, keys, "left_semi")
        .select("__file").distinct()
        .collect().map(_.getString(0)).toSet
    val touchedRel = liveData.filter(f => touchedNames.contains(f.split('/').last))
    var matched = 0L
    var deleted = 0L
    Manifest.rewriteFiles(spark, path,
      drop = (touchedRel ++ liveStats).toSet, shardId, retain,
      baseGen = Some(snap.gen)) { stage =>
      val touchedRows =
        if (touchedRel.isEmpty) target.filter(lit(false)) else readFiles(touchedRel)
      matched = touchedRows.join(updKeys, keys, "left_semi").count()
      deleted = delKeysOpt.fold(0L)(d =>
        touchedRows.join(d, keys, "left_semi").count())
      val survivors = touchedRows.select(target.columns.map(col): _*)
        .join(allKeys, keys, "left_anti")
      // under evolve the survivors lack the new columns — unionByName
      // fills them with NULL, the Delta autoMerge widening
      survivors.unionByName(updates.select(outCols.map(col): _*),
          allowMissingColumns = evolve)
        .write.mode(SaveMode.Append).parquet(s"$stage/$MergeDataSub")
      // stats for the NEW generation, committed with it: carried-over
      // rows for untouched files + a fresh pass over just-written ones
      // (read from the staging dir — file names survive the publish)
      val freshNames = fileNamesIn(spark, s"$stage/$MergeDataSub")
      val keptStats = Manifest.read(spark, path, MergeStatsSub)
        .filter(!col("file_name").isin(touchedNames.toSeq: _*))
      val freshStats =
        if (freshNames.isEmpty) keptStats.filter(lit(false))
        else mergeStatsFor(spark, path, freshNames, keys,
          dataDir = Some(s"$stage/$MergeDataSub"))
      keptStats.unionByName(freshStats).coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"$stage/$MergeStatsSub")
    }
    MergeResult(matched, nUpd - matched, touchedRel.length,
      candRel.length, liveData.length, deleted, applied = true)
    } finally { updates.unpersist(); () }
  }

  /** The generation's stats frame, VERIFIED to cover every live data
    * file — the stage-1 pruning contract. Uncovered files would be
    * silently invisible to candidate selection (a pruned-away file
    * that actually holds matching keys = wrong answers), so any
    * coverage gap — e.g. someone ran raw [[Manifest.compactSub]] on
    * the data sub instead of [[mergeCompact]] — fails loudly here.
    */
  private[graft] def statsCovering(spark: SparkSession, path: String,
                            liveData: Seq[String],
                            asOf: Option[Int]): DataFrame = {
    val stats = Manifest.read(spark, path, MergeStatsSub, asOf)
    val covered = stats.select("file_name").collect().map(_.getString(0)).toSet
    val missing = liveData.map(_.split('/').last).filterNot(covered)
    require(missing.isEmpty,
      s"merge table at $path: stats do not cover ${missing.length} live data " +
        s"file(s) (e.g. ${missing.headOption.getOrElse("")}) — the table was " +
        "modified outside the merge/DML/mergeCompact surface; rebuild with " +
        "mergeInit or compact with mergeCompact")
    stats
  }

  /** `OPTIMIZE [ZORDER BY]` for a merge-managed table: rewrite the
    * data sub as ~`targetFileMB` files — range-clustered by
    * `clusterBy` when given, so each file owns a narrow key band and
    * [[mergeReadRange]]/[[merge]] stage-1 pruning gets sharper — and
    * regenerate the per-file stats in the SAME commit (raw
    * [[Manifest.compactSub]] would orphan them; [[statsCovering]]
    * refuses such a table). Old files stay until their last
    * referencing manifest retires, so time travel and in-flight
    * readers survive. Returns (filesBefore, filesAfter).
    */
  def mergeCompact(spark: SparkSession, path: String, keys: Seq[String],
                   targetFileMB: Int = 128,
                   clusterBy: Seq[String] = Seq.empty,
                   retain: Int = 3): (Int, Int) = {
    val snap = Manifest.snapshot(spark, path)
    val liveData = snap.files.filter(_.startsWith(s"$MergeDataSub/"))
    val liveStats = snap.files.filter(_.startsWith(s"$MergeStatsSub/"))
    if (liveData.isEmpty) return (0, 0)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalMB = math.max(liveData.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$path/$f")).getLen)
      .sum / (1024.0 * 1024.0), 0.001)
    val nFiles = math.max(1, math.ceil(totalMB / targetFileMB).toInt)
    val df = mergeRead(spark, path)
    val shaped =
      if (clusterBy.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, clusterBy.map(col): _*)
    var after = 0
    Manifest.rewriteFiles(spark, path,
      drop = (liveData ++ liveStats).toSet, retain = retain,
      baseGen = Some(snap.gen)) { stage =>
      shaped.write.mode(SaveMode.Append).parquet(s"$stage/$MergeDataSub")
      val freshNames = fileNamesIn(spark, s"$stage/$MergeDataSub")
      after = freshNames.size
      mergeStatsFor(spark, path, freshNames, keys,
          dataDir = Some(s"$stage/$MergeDataSub"))
        .coalesce(1).write.mode(SaveMode.Append).parquet(s"$stage/$MergeStatsSub")
    }
    (liveData.length, after)
  }

  // ── CHECK constraints: Delta's `ALTER TABLE ADD CONSTRAINT` ──────
  //
  // Table-level invariants persisted WITH the table (a tiny
  // `constraints/` sub committed through the same manifest protocol,
  // so constraints version, time-travel, and restore exactly like
  // data) and enforced on every write path that can introduce rows or
  // values: merge / applyChanges upserts and updateWhere's SET
  // results. SQL CHECK semantics: a row violates only when the
  // expression evaluates to FALSE — NULL passes (Delta's rule too).
  // A violating batch refuses BEFORE any commit starts, so the table
  // is untouched — unlike mergeChecked's per-call expectations, these
  // are durable table properties every writer inherits.

  private val ConstraintSub = "constraints"

  /** Add (or replace by name) a CHECK constraint. The expression is a
    * SQL predicate over the table's columns, stored as text and
    * committed as its own manifest generation.
    */
  def addCheckConstraint(spark: SparkSession, path: String,
                         name: String, sqlExpr: String): Unit = {
    // Delta's ADD CONSTRAINT rule: existing rows must already satisfy
    // the new invariant (also catches unparseable/unresolvable
    // expressions up front — a broken constraint stored now would
    // brick every later merge)
    val existing = mergeRead(spark, path)
      .filter(coalesce(expr(sqlExpr), lit(true)) === false).count()
    require(existing == 0L,
      s"addCheckConstraint($name): $existing existing row(s) violate " +
        s"'$sqlExpr' — clean the table first (Delta refuses the same way)")
    val prev = checkConstraints(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    val next = (prev + (name -> sqlExpr)).toSeq
    replaceRules(spark, path, ConstraintSub, next)
  }

  /** Drop a CHECK constraint by name (no-op when absent). */
  def dropCheckConstraint(spark: SparkSession, path: String,
                          name: String): Unit = {
    val prev = checkConstraints(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    replaceRules(spark, path, ConstraintSub, (prev - name).toSeq)
  }

  // ── generated columns: Delta's GENERATED ALWAYS AS ───────────────
  //
  // A column whose value is DERIVED from other columns by a stored
  // expression: merge batches may omit it entirely (the table computes
  // it — the writer-ergonomics half), and when a batch does carry it,
  // every provided value must equal the expression (the integrity
  // half — Delta enforces generated columns exactly like invariants).
  // Rules ride the same manifest-committed storage as CHECK
  // constraints, so they version, time-travel and restore with the
  // data.

  private val GeneratedSub = "generated"

  /** Declare `name` as generated by `sqlExpr` (a SQL expression over
    * the OTHER columns). The column must already exist with values
    * consistent with the expression — like [[addCheckConstraint]],
    * retrofitting onto a divergent table is refused.
    */
  def addGeneratedColumn(spark: SparkSession, path: String,
                         name: String, sqlExpr: String): Unit = {
    val target = mergeRead(spark, path)
    require(target.columns.contains(name),
      s"addGeneratedColumn: column $name does not exist in the table at " +
        s"$path — generated columns derive an EXISTING column's values")
    val divergent = target.filter(!(col(name) <=> expr(sqlExpr))).count()
    require(divergent == 0L,
      s"addGeneratedColumn($name): $divergent existing row(s) diverge from " +
        s"'$sqlExpr' — clean the table first")
    val prev = generatedColumns(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    replaceRules(spark, path, GeneratedSub, (prev + (name -> sqlExpr)).toSeq)
  }

  /** Drop a generated-column rule by name (the column itself stays). */
  def dropGeneratedColumn(spark: SparkSession, path: String,
                          name: String): Unit = {
    val prev = generatedColumns(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    replaceRules(spark, path, GeneratedSub, (prev - name).toSeq)
  }

  /** The table's generated-column rules as (name, expr). */
  def generatedColumns(spark: SparkSession, path: String,
                       asOf: Option[Int] = None): DataFrame =
    readRules(spark, path, GeneratedSub, asOf)

  /** Apply the table's generated-column rules to a merge batch:
    * missing generated columns are COMPUTED (appended; the merge's
    * shape check then sees the full schema), provided ones are
    * VERIFIED against their expressions (one conditional-count pass;
    * divergence refuses before any commit machinery starts).
    */
  private def applyGenerated(spark: SparkSession, path: String,
                             updates: DataFrame): DataFrame = {
    val rules = generatedColumns(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (rules.isEmpty) return updates
    val (provided, missing) = rules.partition {
      case (n, _) => updates.columns.contains(n)
    }
    if (provided.nonEmpty) {
      val aggs = provided.map { case (n, e) =>
        sum(when(!(col(n) <=> expr(e)), 1L).otherwise(0L)).as(n)
      }
      val row = updates.agg(aggs.head, aggs.tail: _*).head()
      val viol = provided.zipWithIndex
        .map { case ((n, e), i) =>
          (n, e, if (row.isNullAt(i)) 0L else row.getLong(i)) }
        .filter(_._3 > 0)
      if (viol.nonEmpty)
        throw new IllegalArgumentException(
          s"merge on $path: provided value(s) diverge from generated " +
            "column expression(s) " +
            viol.map { case (n, e, c) => s"$n ($e): $c row(s)" }
              .mkString("; ") + " — omit the column or match the expression")
    }
    missing.foldLeft(updates) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
  }

  /** Shared storage for table-level (name, expr) rule sets —
    * CHECK constraints and generated columns both ride it: a tiny
    * parquet under `path/<sub>/`, swapped whole as one manifest
    * generation, so rules version/time-travel/restore with the data.
    */
  private def replaceRules(spark: SparkSession, path: String, sub: String,
                           all: Seq[(String, String)]): Unit = {
    import spark.implicits._
    val snap = Manifest.snapshot(spark, path)
    val old = snap.files.filter(_.startsWith(s"$sub/")).toSet
    Manifest.rewriteFiles(spark, path, drop = old,
      baseGen = Some(snap.gen)) { stage =>
      if (all.nonEmpty)
        all.toDF("name", "expr").coalesce(1)
          .write.mode(SaveMode.Append).parquet(s"$stage/$sub")
    }
    ()
  }

  private def readRules(spark: SparkSession, path: String, sub: String,
                        asOf: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val snap = Manifest.snapshot(spark, path, asOf)
    if (!snap.files.exists(_.startsWith(s"$sub/")))
      Seq.empty[(String, String)].toDF("name", "expr")
    else Manifest.read(spark, path, sub, asOf)
      .select(col("name"), col("expr"))
  }

  /** The table's CHECK constraints as (name, expr) — empty when none.
    * Generation-pinned like everything else (`asOf`).
    */
  def checkConstraints(spark: SparkSession, path: String,
                       asOf: Option[Int] = None): DataFrame =
    readRules(spark, path, ConstraintSub, asOf)

  /** Refuse `rows` when any CHECK constraint of the head generation
    * evaluates to FALSE on any row (one conditional-count aggregate
    * for ALL constraints — a single pass regardless of count).
    */
  private def enforceConstraints(spark: SparkSession, path: String,
                                 rows: DataFrame, what: String): Unit = {
    val cs = checkConstraints(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (cs.isEmpty) return
    val aggs = cs.map { case (name, e) =>
      sum(when(coalesce(expr(e), lit(true)) === false, 1L).otherwise(0L)).as(name)
    }
    val row = rows.agg(aggs.head, aggs.tail: _*).head()
    val viol = cs.zipWithIndex
      .map { case ((name, e), i) =>
        (name, e, if (row.isNullAt(i)) 0L else row.getLong(i)) }
      .filter(_._3 > 0)
    if (viol.nonEmpty)
      throw new IllegalArgumentException(
        s"$what on $path violates CHECK constraint(s) " +
          viol.map { case (n, e, c) => s"$n ($e): $c row(s)" }.mkString("; ") +
          " — nothing was committed")
  }

  /** Auto-OPTIMIZE policy for streaming merge sinks: run
    * [[mergeCompact]] (key-clustered, so stage-1 stats pruning stays
    * sharp) when the table's live data file count exceeds `maxFiles`.
    * A merge sink commits one generation per micro-batch and each
    * generation adds files; without a compaction policy the file count
    * — and with it every later merge's stats scan and candidate set —
    * grows without bound. Delta pairs its streaming MERGE recipe with
    * auto-optimize for the same reason. Cheap when below threshold
    * (one driver-side snapshot read); returns true when a compaction
    * ran.
    */
  def mergeAutoCompact(spark: SparkSession, path: String, keys: Seq[String],
                       maxFiles: Int, targetFileMB: Int = 128,
                       retain: Int = 3): Boolean = {
    require(maxFiles >= 1, s"mergeAutoCompact: maxFiles must be >= 1")
    val live = Manifest.snapshot(spark, path).files
      .count(_.startsWith(s"$MergeDataSub/"))
    if (live <= maxFiles) false
    else {
      mergeCompact(spark, path, keys, targetFileMB, clusterBy = keys,
        retain = retain)
      true
    }
  }

  /** [[mergeRead]] restricted to `lo <= keyCol <= hi`, pruning whole
    * files through the stats committed WITH the generation — Delta
    * data skipping on the READ path, with no stale-stats window by
    * construction (unlike [[readSkipping]]'s rebuild-after-append
    * contract, the manifest commit is the rebuild). Files whose
    * `[min, max]` range misses the bounds are never opened; the
    * residual predicate still applies row-level.
    */
  def mergeReadRange(spark: SparkSession, path: String, keyCol: String,
                     lo: Column, hi: Column,
                     asOf: Option[Int] = None): DataFrame = {
    val snap = Manifest.snapshot(spark, path, asOf)
    val liveData = snap.files.filter(_.startsWith(s"$MergeDataSub/"))
    val keep = !(col(s"max_$keyCol") < lo || col(s"min_$keyCol") > hi)
    val candNames = statsCovering(spark, path, liveData, asOf)
      .filter(keep).select("file_name")
      .collect().map(_.getString(0)).toSet
    val cand = liveData.filter(f => candNames.contains(f.split('/').last))
    val pred = col(keyCol) >= lo && col(keyCol) <= hi
    if (cand.isEmpty) mergeRead(spark, path, asOf).filter(pred).filter(lit(false))
    else spark.read.option("basePath", s"$path/$MergeDataSub")
      .option("mergeSchema", "true")
      .parquet(cand.map(f => s"$path/$f"): _*).filter(pred)
  }

  /** Change data feed between two generations of a merge-managed
    * table (Delta `table_changes` on the DML surface): one row per key
    * whose row changed between `fromGen` and `toGen` (head when None),
    * typed `insert` / `update` / `delete`, with full before/after
    * images. A full-outer key join of two generation-pinned reads —
    * both sides prune columns and the join shuffles by key once.
    */
  def mergeChanges(spark: SparkSession, path: String, keys: Seq[String],
                   fromGen: Int, toGen: Option[Int] = None): DataFrame = {
    val head = mergeRead(spark, path)
    val valueCols = head.columns.filterNot(keys.contains).toSeq
    val headTypes = head.schema.fields.map(f => f.name -> f.dataType).toMap
    // a generation PRE-dating an additive evolution lacks the newer
    // columns entirely (none of its files carry them) — surface them
    // as typed NULLs so the before/after comparison stays well-formed
    def side(g: Option[Int], p: String) = {
      val df = mergeRead(spark, path, g)
      val have = df.columns.toSet
      df.select(keys.map(col) ++ valueCols.map { c =>
        (if (have(c)) col(c) else lit(null).cast(headTypes(c))).as(s"${p}_$c")
      }: _*)
    }
    val joined = side(Some(fromGen), "before")
      .withColumn("__in_before", lit(true))
      .join(side(toGen, "after").withColumn("__in_after", lit(true)),
        keys, "full_outer")
    val changed = valueCols.map(c =>
      not(col(s"before_$c") <=> col(s"after_$c"))).reduce(_ || _)
    joined.withColumn("change_type",
        when(col("__in_before").isNull, lit("insert"))
          .when(col("__in_after").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .drop("__in_before", "__in_after")
  }

  /** Expectations-gated upsert — the write-audit-publish pattern (DLT
    * expectations / Delta WAP): every `checks` predicate must hold on
    * EVERY update row, or nothing publishes. Returns `Left(report)` —
    * one `(constraint, violations)` row per failed check, the
    * [[graft.operators.Expectations]] shape — with the table untouched
    * (readers keep the current generation; there is no partial state
    * to clean up because no commit ever started), or `Right(result)`
    * of the applied [[merge]]. The audit is one conditional-count agg
    * over the batch.
    */
  def mergeChecked(spark: SparkSession, path: String, updates: DataFrame,
                   keys: Seq[String], checks: Seq[(String, Column)],
                   shardId: Option[String] = None,
                   retain: Int = 3): Either[DataFrame, MergeResult] = {
    require(checks.nonEmpty, "mergeChecked: no expectations given")
    import spark.implicits._
    val aggs = checks.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val row = updates.agg(aggs.head, aggs.tail: _*).head()
    val report = checks.zipWithIndex.map { case ((name, _), i) =>
      (name, if (row.isNullAt(i)) 0L else row.getLong(i))
    }.filter(_._2 > 0)
    if (report.nonEmpty) Left(report.toDF("constraint", "violations"))
    else Right(merge(spark, path, updates, keys, shardId, retain))
  }

  // ── DELETE / UPDATE WHERE: the rest of the Delta DML triad ────────
  //
  // Same execution shape as [[merge]]: find the files that contain any
  // predicate-matching row (a column-pruned scan — only the predicate's
  // columns are read), rewrite ONLY those (dropping or transforming the
  // matching rows), commit atomically as one manifest generation with
  // regenerated stats for the fresh files. Untouched files — at 100 TB,
  // almost all of them for a selective predicate — never rewrite.

  /** Outcome of one [[deleteWhere]]/[[updateWhere]]: affected row
    * count and the file funnel.
    */
  case class DmlResult(affected: Long, filesRewritten: Int, filesLive: Int,
                       applied: Boolean)

  /** Delete every row matching `predicate` from the merge-managed
    * table at `path` (Delta `DELETE FROM ... WHERE`). `keys` are the
    * table's stats columns (as at [[mergeInit]]) so the rewritten
    * files' stats regenerate consistently.
    */
  def deleteWhere(spark: SparkSession, path: String, predicate: Column,
                  keys: Seq[String], shardId: Option[String] = None,
                  retain: Int = 3): DmlResult =
    // enforce = false: removing rows cannot violate a row-level CHECK
    dmlRewrite(spark, path, predicate, keys, shardId, retain,
      enforce = false)(
      touched => touched.filter(!coalesce(predicate, lit(false))))

  /** Update `set` columns on every row matching `predicate` (Delta
    * `UPDATE ... SET ... WHERE`); non-matching rows in touched files
    * are rewritten byte-identical, untouched files not at all.
    */
  def updateWhere(spark: SparkSession, path: String, predicate: Column,
                  set: Map[String, Column], keys: Seq[String],
                  shardId: Option[String] = None,
                  retain: Int = 3): DmlResult = {
    // type-check every SET expression against the target schema BEFORE
    // any rewrite: a drifted value type (lit("x") into a long column)
    // would rewrite touched files with a different column type next to
    // untouched originals and commit atomically — poisoning every
    // later multi-file read. Same fail-up-front rule merge's shape
    // check enforces (and Delta's UPDATE resolution enforces).
    val target = mergeRead(spark, path)
    set.foreach { case (c, v) =>
      val tf = target.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"updateWhere: SET column $c does not exist in the table at $path"))
      val vt = target.select(v.as(c)).schema.head.dataType
      require(vt == tf.dataType,
        s"updateWhere: SET $c = <expr of type $vt> does not match the " +
          s"target column's type ${tf.dataType} — cast explicitly (a " +
          "type-drifted rewrite would poison later multi-file reads)")
    }
    val cond = coalesce(predicate, lit(false))
    dmlRewrite(spark, path, predicate, keys, shardId, retain,
      enforce = true)(touched =>
      touched.select(touched.columns.map { c =>
        set.get(c).map(v => when(cond, v).otherwise(col(c)).as(c))
          .getOrElse(col(c))
      }: _*))
  }

  /** Shared DELETE/UPDATE core: `transform` maps the touched files'
    * rows to their rewritten form.
    */
  private def dmlRewrite(spark: SparkSession, path: String,
                         predicate: Column, keys: Seq[String],
                         shardId: Option[String], retain: Int,
                         enforce: Boolean = false)
                        (transform: DataFrame => DataFrame): DmlResult = {
    val snap = Manifest.snapshot(spark, path)
    if (shardId.exists(snap.applied))
      return DmlResult(0, 0,
        snap.files.count(_.startsWith(s"$MergeDataSub/")), applied = false)
    val liveData = snap.files.filter(_.startsWith(s"$MergeDataSub/"))
    val liveStats = snap.files.filter(_.startsWith(s"$MergeStatsSub/"))
    def readFiles(rel: Seq[String]): DataFrame =
      spark.read.option("basePath", s"$path/$MergeDataSub")
        .option("mergeSchema", "true")
        .parquet(rel.map(f => s"$path/$f"): _*)
    // touched files: any predicate-matching row (scan reads only the
    // predicate's columns + the file name)
    val touchedNames: Set[String] =
      if (liveData.isEmpty) Set.empty
      else readFiles(liveData).filter(predicate)
        .select(col("_metadata.file_name").as("__file")).distinct()
        .collect().map(_.getString(0)).toSet
    val touchedRel = liveData.filter(f => touchedNames.contains(f.split('/').last))
    var affected = 0L
    Manifest.rewriteFiles(spark, path,
      drop = (touchedRel ++ liveStats).toSet, shardId, retain,
      baseGen = Some(snap.gen)) { stage =>
      val target = mergeRead(spark, path)
      val touchedRows =
        if (touchedRel.isEmpty) target.filter(lit(false)) else readFiles(touchedRel)
      affected = touchedRows.filter(predicate).count()
      val out = transform(touchedRows.select(target.columns.map(col): _*))
      // CHECK constraints gate the SET results pre-commit: throwing
      // here aborts before any staged file publishes
      if (enforce) enforceConstraints(spark, path, out, "updateWhere")
      out.write.mode(SaveMode.Append).parquet(s"$stage/$MergeDataSub")
      val freshNames = fileNamesIn(spark, s"$stage/$MergeDataSub")
      val keptStats = Manifest.read(spark, path, MergeStatsSub)
        .filter(!col("file_name").isin(touchedNames.toSeq: _*))
      val freshStats =
        if (freshNames.isEmpty) keptStats.filter(lit(false))
        else mergeStatsFor(spark, path, freshNames, keys,
          dataDir = Some(s"$stage/$MergeDataSub"))
      keptStats.unionByName(freshStats).coalesce(1)
        .write.mode(SaveMode.Append).parquet(s"$stage/$MergeStatsSub")
    }
    DmlResult(affected, touchedRel.length, liveData.length, applied = true)
  }
}
