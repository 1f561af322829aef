package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Generation-manifest commit protocol for persisted index stores —
  * the candle store's durability model ([[graft.operators.Candles]],
  * itself the plain-parquet analog of Delta's `_delta_log`, reference
  * `data/delta/bronze/_delta_log/00000000000000000000.json`)
  * generalized to ANY store layout, so the ANN / near-dup / vocab /
  * NB / heavy-hitter / quantile / moment stores share one durability
  * story instead of each holding only the weaker `_applied` ledger.
  *
  * Layout under a store root `path`:
  *  - data files wherever the store writes them (`path/vocab/`,
  *    `path/codes/cell=N/`, ... — the protocol does not care);
  *  - `_meta/manifest-N/`: a tiny parquet table (one coalesced file)
  *    listing every LIVE data file (root-relative) plus the applied
  *    shard-id ledger. Spark's `_SUCCESS` marker is the commit point —
  *    a manifest dir without it is an aborted commit and invisible.
  *
  * The newest committed manifest IS the store state. That buys, for
  * every store routed through here:
  *  - **atomic visibility / snapshot isolation** — readers resolve the
  *    live file SET through one committed manifest, so a reader racing
  *    an extend sees the old generation in full, never a torn mix of
  *    half-appended shard files (`spark.read.parquet(dir)` on an
  *    append-in-progress directory has no such guarantee);
  *  - **crash safety** — a crash mid-extend leaves data files no
  *    manifest references; readers never see them, and the blind retry
  *    (same shard id) writes fresh uniquely-named files and commits a
  *    manifest referencing only those. This CLOSES the mid-write crash
  *    window the bare ledger documents as out of scope
  *    ([[Lake.recordApplied]]'s guarantee-scope note);
  *  - **idempotent re-delivery** — the shard ledger rides inside the
  *    manifest (the Delta `txn` action), committed atomically WITH the
  *    files it covers: there is no state where data landed but the
  *    ledger missed it or vice versa;
  *  - **time travel** — every retained generation stays resolvable
  *    (`asOf`), the `VERSION AS OF` analog, for free from the layout.
  *
  * Concurrency contract (same as the candle store and
  * [[Lake.compact]]): ONE writer at a time — the caller serializes
  * builds/extends (foreachBatch micro-batches already are). Readers
  * are unrestricted and never block.
  *
  * Scale notes: a manifest holds one short string per live data file —
  * the cardinality any parquet reader's file index already handles —
  * and commits are one coalesced tiny file. New-file discovery is a
  * listing diff around the write callback, O(store files) per extend;
  * Delta proper avoids even that by having the committer report its
  * adds, an optimization a real cluster deployment would plug in here
  * without changing the protocol or its readers.
  */
object Manifest {

  /** A committed store generation: number, live data files
    * (root-relative, sorted), applied shard ids.
    */
  case class Snapshot(gen: Int, files: Seq[String], applied: Set[String])

  private def metaPath(path: String) = s"$path/_meta"

  private def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Generation numbers of every COMMITTED manifest (`_SUCCESS`
    * present), ascending — the store's time-travel points.
    */
  def generations(spark: SparkSession, path: String): Seq[Int] = {
    val fs = fsOf(spark, path)
    val mp = new org.apache.hadoop.fs.Path(metaPath(path))
    if (!fs.exists(mp)) Seq.empty
    else fs.listStatus(mp)
      .filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("manifest-") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("manifest-").toInt)
      .sorted.toSeq
  }

  /** True when `path` carries at least one committed manifest — the
    * marker distinguishing a manifest-managed store from a bare
    * directory.
    */
  def isManaged(spark: SparkSession, path: String): Boolean =
    generations(spark, path).nonEmpty

  /** Resolve one committed generation — the newest when `asOf` is
    * None. Driver-side: one listing plus one tiny parquet read.
    */
  def snapshot(spark: SparkSession, path: String,
               asOf: Option[Int] = None): Snapshot = {
    val gens = generations(spark, path)
    require(gens.nonEmpty, s"no committed manifest under $path")
    val n = asOf match {
      case None => gens.max
      case Some(g) =>
        require(gens.contains(g),
          s"store generation $g not retained under $path " +
            s"(available: ${gens.mkString(",")})")
        g
    }
    val rows = spark.read.parquet(s"${metaPath(path)}/manifest-$n").collect()
    Snapshot(n,
      rows.filter(!_.isNullAt(0)).map(_.getString(0)).sorted.toSeq,
      rows.filter(_.isNullAt(0)).map(_.getString(1)).toSet)
  }

  /** Shard ids already committed (empty when the store has no
    * manifest yet) — the [[Lake.appliedShards]] shape, manifest-backed.
    */
  def applied(spark: SparkSession, path: String): Set[String] =
    if (!isManaged(spark, path)) Set.empty
    else snapshot(spark, path).applied

  /** Write + commit manifest `n`. Overwrite mode makes a crashed
    * attempt retryable; `_SUCCESS` (written last by the committer) is
    * the commit point.
    */
  private def commit(spark: SparkSession, path: String, n: Int,
                     files: Seq[String], applied: Set[String]): Unit = {
    import spark.implicits._
    val rows = files.map(f => (Option(f), Option.empty[String])) ++
      applied.toSeq.map(s => (Option.empty[String], Option(s)))
    rows.toDF("file", "shard_id")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${metaPath(path)}/manifest-$n")
  }

  /** Root-relative paths of every visible data file under `path`
    * (dot/underscore names are metadata — the `_meta` tree and any
    * `_SUCCESS`/`.crc` droppings are never data). Hadoop FS API, so the
    * protocol is storage-agnostic (local now, HDFS/object store on a
    * cluster).
    */
  private def listData(spark: SparkSession, path: String): Set[String] = {
    val fs = fsOf(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) return Set.empty
    def walk(dir: org.apache.hadoop.fs.Path, prefix: String): Seq[String] = {
      val kids = fs.listStatus(dir)
        .filter(s => !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
      kids.filter(_.isFile).map(s => s"$prefix${s.getPath.getName}").toSeq ++
        kids.filter(_.isDirectory)
          .flatMap(s => walk(s.getPath, s"$prefix${s.getPath.getName}/"))
    }
    walk(root, "").toSet
  }

  /** Initialize the store: clear any previous epoch entirely (a
    * surviving higher-numbered manifest or stale ledger would shadow
    * the rebuild — same rule as the candle store's re-build), run
    * `write` (the store's Overwrite-mode artifact writes), and commit
    * everything it produced as generation 0 with an empty ledger.
    */
  def init(spark: SparkSession, path: String)(write: => Unit): Unit = {
    val fs = fsOf(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(p)) { fs.delete(p, true); () }
    write
    commit(spark, path, 0, listData(spark, path).toSeq.sorted, Set.empty)
  }

  /** Fold one shard in: skip entirely when `shardId` is already in the
    * ledger (re-delivery no-op — `write` never runs), otherwise run
    * `write` (the store's Append-mode shard writes), diff the listing,
    * and commit generation `n+1` = previous files + the new ones +
    * the shard id, then retire generations beyond `retain`.
    *
    * A shard whose `write` produces NO files still commits (the ledger
    * must record it — empty micro-batches are normal in streaming
    * maintenance). Data files a crashed previous attempt orphaned are
    * in the before-listing, so they are never adopted into a manifest;
    * [[vacuum]] reclaims them.
    *
    * Returns true when the shard was applied, false on the no-op.
    */
  def extend(spark: SparkSession, path: String,
             shardId: Option[String] = None, retain: Int = 3)
            (write: => Unit): Boolean = {
    require(retain >= 2,
      "retain must be >= 2 (current + the in-flight-reader grace generation)")
    val prev = snapshot(spark, path)
    if (shardId.exists(prev.applied)) return false
    val before = listData(spark, path)
    write
    val fresh = (listData(spark, path) -- before).toSeq.sorted
    val n = prev.gen + 1
    commit(spark, path, n, prev.files ++ fresh, prev.applied ++ shardId)
    retire(spark, path, n, retain)
    true
  }

  /** [[extend]] for stores that REWRITE an artifact instead of
    * appending to it (e.g. a relabeled component table): the commit
    * carries forward every previous file EXCEPT those under
    * `dropSub/`, plus whatever `write` produced — which must land in a
    * fresh version directory under `dropSub/` (never Overwrite the old
    * files; retained generations still reference them, and [[retire]]
    * deletes them only once no retained manifest does). Replaces the
    * rename-swap idiom and its reader-facing PATH_NOT_FOUND window:
    * readers resolve old or new atomically, never an absent table.
    */
  def replace(spark: SparkSession, path: String, dropSub: String,
              shardId: Option[String] = None, retain: Int = 3)
             (write: => Unit): Boolean = {
    require(retain >= 2,
      "retain must be >= 2 (current + the in-flight-reader grace generation)")
    val prev = snapshot(spark, path)
    if (shardId.exists(prev.applied)) return false
    val before = listData(spark, path)
    write
    val fresh = (listData(spark, path) -- before).toSeq.sorted
    val kept = prev.files.filterNot(_.startsWith(s"$dropSub/"))
    val n = prev.gen + 1
    commit(spark, path, n, kept ++ fresh, prev.applied ++ shardId)
    retire(spark, path, n, retain)
    true
  }

  /** [[replace]] at FILE granularity: the commit carries forward every
    * previous file except the explicit `drop` set (root-relative
    * paths), plus whatever `write` produced. The primitive behind
    * [[Lake.merge]]'s Delta-style upsert — only the files that contain
    * matched keys leave the live set, every other file survives the
    * commit untouched on disk. Dropped files stay physically present
    * until no retained manifest references them ([[retire]]), so
    * in-flight readers and `asOf` time travel keep resolving them.
    */
  def rewriteFiles(spark: SparkSession, path: String, drop: Set[String],
                   shardId: Option[String] = None, retain: Int = 3)
                  (write: => Unit): Boolean = {
    require(retain >= 2,
      "retain must be >= 2 (current + the in-flight-reader grace generation)")
    val prev = snapshot(spark, path)
    if (shardId.exists(prev.applied)) return false
    val before = listData(spark, path)
    write
    val fresh = (listData(spark, path) -- before).toSeq.sorted
    val kept = prev.files.filterNot(drop)
    val n = prev.gen + 1
    commit(spark, path, n, kept ++ fresh, prev.applied ++ shardId)
    retire(spark, path, n, retain)
    true
  }

  /** The files of one generation that live under `path/sub`, read with
    * `basePath = path/sub` so partition directories (`cell=N`, ...)
    * still surface as columns. `schemaFrom` supplies the frame when the
    * generation holds no files under `sub` (an empty parquet read has
    * no schema to stand on): pass any plan with the store's schema and
    * the empty case returns its zero-row filter.
    */
  def read(spark: SparkSession, path: String, sub: String,
           asOf: Option[Int] = None,
           schemaFrom: Option[DataFrame] = None): DataFrame = {
    val snap = snapshot(spark, path, asOf)
    val prefix = s"$sub/"
    val files = snap.files.filter(_.startsWith(prefix))
      .map(f => s"$path/$f")
    if (files.isEmpty) {
      val base = schemaFrom.getOrElse(
        throw new IllegalStateException(
          s"generation ${snap.gen} of $path has no files under $sub/ " +
            "and no schemaFrom fallback was supplied"))
      base.filter(org.apache.spark.sql.functions.lit(false))
    } else
      spark.read.option("basePath", s"$path/$sub").parquet(files: _*)
  }

  /** Delta's `RESTORE TABLE ... VERSION AS OF` — roll the store back
    * to a retained generation by committing a NEW head whose file list
    * is the target generation's (no data moves; the rollback itself is
    * time-travelable and vacuum-safe because every referenced file is
    * now live again under the new head). The applied-shard ledger
    * keeps the CURRENT head's ids — like Delta, restore rewinds data,
    * not writer-idempotency history (a replayed shard id after a
    * restore must still no-op). Returns the new head generation.
    */
  def restore(spark: SparkSession, path: String, gen: Int,
              retain: Int = 3): Int = {
    val target = snapshot(spark, path, Some(gen))
    val head = snapshot(spark, path)
    val n = head.gen + 1
    commit(spark, path, n, target.files, head.applied)
    retire(spark, path, n, retain)
    n
  }

  /** Drop manifests older than the newest `retain` generations and
    * every data file only they reference. The retained window is both
    * the in-flight-reader grace period and the time-travel horizon.
    */
  private def retire(spark: SparkSession, path: String,
                     current: Int, retain: Int): Unit = {
    val fs = fsOf(spark, path)
    val floor = current - (retain - 1)
    val gens = generations(spark, path)
    val keep = gens.filter(_ >= floor)
    if (keep.sorted == gens.sorted) return
    val live = keep.flatMap(g => snapshot(spark, path, Some(g)).files).toSet
    val dead = gens.filterNot(_ >= floor)
      .flatMap(g => snapshot(spark, path, Some(g)).files)
      .toSet -- live
    dead.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$f"), false); ()
    }
    gens.filterNot(_ >= floor).foreach { g =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"${metaPath(path)}/manifest-$g"), true); ()
    }
  }

  /** Small-files maintenance for a manifest-managed store — Delta's
    * `OPTIMIZE` against this protocol, replacing [[Lake.compact]]
    * (which rewrites files in place and would sever every manifest
    * that references them; it REFUSES manifest-managed dirs for that
    * reason). The live rows under `path/sub` are read generation-
    * pinned, rewritten as ~`targetFileMB` files APPENDED next to the
    * old ones (parquet part names are unique — no collision), and the
    * commit swaps the sub's file list to the fresh set. Old files stay
    * on disk until their last referencing manifest retires, so
    * in-flight readers and `asOf` time travel survive the compaction —
    * exactly Delta's OPTIMIZE-then-VACUUM split. Partition dirs
    * (`cell=N`, ...) are preserved: rows are hash-clustered by the
    * partition columns inferred from the live file paths and written
    * through the same dynamic layout. Returns (filesBefore,
    * filesAfter) for the sub.
    */
  def compactSub(spark: SparkSession, path: String, sub: String,
                 targetFileMB: Int = 128, retain: Int = 3): (Int, Int) = {
    val prev = snapshot(spark, path)
    val prefix = s"$sub/"
    val liveSub = prev.files.filter(_.startsWith(prefix))
    if (liveSub.isEmpty) return (0, 0)
    // partition columns: k=v segments between sub/ and the file name
    val partCols = liveSub.head.stripPrefix(prefix).split("/").dropRight(1)
      .filter(_.contains("=")).map(_.split("=", 2)(0)).toSeq
    val fs = fsOf(spark, path)
    val totalMB = math.max(liveSub.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$path/$f")).getLen)
      .sum / (1024.0 * 1024.0), 0.001)
    val nFiles = math.max(1, math.ceil(totalMB / targetFileMB).toInt)
    val df = read(spark, path, sub)
    val shaped =
      if (partCols.isEmpty) df.repartition(nFiles)
      else df.repartition(nFiles,
        partCols.map(org.apache.spark.sql.functions.col): _*)
    val before = listData(spark, path)
    val w = shaped.write.mode(SaveMode.Append)
    (if (partCols.isEmpty) w else w.partitionBy(partCols: _*))
      .parquet(s"$path/$sub")
    val fresh = (listData(spark, path) -- before).toSeq.sorted
    val kept = prev.files.filterNot(_.startsWith(prefix))
    val n = prev.gen + 1
    commit(spark, path, n, kept ++ fresh, prev.applied)
    retire(spark, path, n, retain)
    (liveSub.length, fresh.length)
  }

  /** Delete data files no RETAINED manifest references — crashed-write
    * orphans and stragglers [[retire]] could not attribute. Safe only
    * under the single-writer contract (an in-flight extend's
    * uncommitted files would look like orphans). Returns the count.
    */
  def vacuum(spark: SparkSession, path: String): Int = {
    val fs = fsOf(spark, path)
    val live = generations(spark, path)
      .flatMap(g => snapshot(spark, path, Some(g)).files).toSet
    val orphans = listData(spark, path) -- live
    orphans.foreach { f =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$f"), false); ()
    }
    orphans.size
  }
}
