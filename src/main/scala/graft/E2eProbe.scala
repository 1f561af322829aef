package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end scale probe (r12 VERDICT task 7): the COMPOSED
  * bronze→silver→gold medallion flow plus the `cur_pipeline7` curation
  * chain, run at a 10× corpus (`target/sf1` by default) in ONE
  * checkpointed session — ScaleProbe measures families in isolation;
  * this measures the flow a deployment actually runs, and hash-checks
  * the gold outputs against their independent batch recomputation
  * (the medallion equivalence the sf0.01 driver gate pins, re-proven
  * at 10×):
  *
  *  1. silver: typed/filtered projection of the raw events;
  *  2. gold (streamed, append): the watermark-finalized candle stream
  *     replayed chronologically — checked row-for-row against the
  *     batch OHLCV restricted to finalized windows
  *     (`window_end ≤ max(ts) − watermark`, the driver oracle's rule);
  *  3. gold (streamed store): incremental candle-store maintenance —
  *     checked against the UNFILTERED batch OHLCV (update semantics);
  *  4. serving: latest-per-symbol over the store's candles;
  *  5. curation: the `cur_pipeline7` chain verbatim (bloom decon →
  *     keep-best canonical → per-source cap → epoch allocation), with
  *     its budget/coverage invariants asserted in-engine.
  *
  * Prints one JSON line per stage. Not part of the gate surface — a
  * measurement tool, like Bench/ScaleProbe.
  */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("e2e-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed[A](what: String)(body: => A): A = {
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      val out = body
      println(f"""{"probe":"$what","wall_sec":${(System.nanoTime() - t0) / 1e9}%.2f,"cpu_sec":${(osBean.getProcessCpuTime - c0) / 1e9}%.2f}""")
      out
    }
    def eq(what: String, got: DataFrame, want: DataFrame): Unit = {
      val (g, w) = (got.count(), want.count())
      val extra = got.exceptAll(want).count()
      val missing = want.exceptAll(got).count()
      val ok = extra == 0 && missing == 0 && g == w
      println(s"""{"probe":"$what","rows":$g,"oracle_rows":$w,"extra":$extra,"missing":$missing,"match":$ok}""")
      require(ok, s"$what: streamed output diverges from batch oracle")
    }
    import graft.operators.{Candles, Curation, Dedup}
    import graft.util.Tables

    val events = Tables.events(spark, dir)

    // 1. silver (map-only typed projection, the medallion's P3-P6)
    val silver = timed("silver_typed") {
      val s = SparkEntry.queries("silver_typed_events")(spark, dir)
      println(s"""{"probe":"silver_rows","rows":${s.count()}}""")
      s
    }

    // 2. gold, streamed append mode with watermark finalization —
    // chronological replay of the FULL sf corpus through the real
    // Structured Streaming machinery (checkpointed micro-batches)
    val streamedGold = timed("gold_stream_append") {
      graft.streaming.StreamedBatch.replayAggregate(spark, events,
        "ts", "event_id",
        st => Candles.ohlcv(st.withWatermark("ts", "10 minutes"),
          tieCol = Some("event_id")))
    }
    val batchGold = Candles.ohlcv(events, tieCol = Some("event_id"))
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val finalized = batchGold.filter(
      col("window_end") <= lit(maxTs) - expr("INTERVAL 10 MINUTES"))
    eq("gold_stream_vs_batch", streamedGold, finalized)

    // 3. gold through the streamed candle STORE (incremental view
    // maintenance; update semantics — every window, live ones too)
    val storeDir = java.nio.file.Files
      .createTempDirectory("e2e-candle-store-").toString
    val served = timed("gold_candle_store") {
      graft.streaming.StreamedBatch.replayIntoCandleStore(spark, events,
        "ts", "event_id", storeDir)
    }
    eq("gold_store_vs_batch", served, batchGold)

    // 4. serving over the store's candles
    timed("serve_latest_per_symbol") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy(col("window_start").desc)
      val latest = served.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      println(s"""{"probe":"serve_rows","rows":${latest.count()}}""")
    }

    // 5. cur_pipeline7 verbatim at this sf (the release-recipe chain)
    val docs = Tables.documents(spark, dir)
    val recipe = timed("cur_pipeline7") {
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val clean = Dedup.materialize(Curation.decontaminateByBloom(
        corpus, bench, n = 2, threshold = 0.5))
      val canon = Dedup.keepBestPerComponent(clean,
        Dedup.ngramJaccard(clean, n = 2, threshold = 0.5),
        orderDescCols = Seq("n_chars", "doc_id"))
      val capped = Curation.capPerStratum(canon, "source", "doc_id",
        k = 20, seed = "p7")
      Curation.epochAllocation(capped, "source", "n_chars",
        alpha = 0.7, budgetTokens = 1000000L).cache()
    }
    // in-engine invariants: the allocation spends at most the budget
    // (alloc_tokens is rounded to 2 dp per stratum — allow that much
    // slack) and covers at least one surviving stratum
    val row = recipe.agg(
      coalesce(sum(col("alloc_tokens")), lit(0.0)).as("spent"),
      count(lit(1)).as("strata")).head()
    val (spent, strata) = (row.getDouble(0), row.getLong(1))
    val budgetOk = spent <= 1000000.0 + 0.01 * strata
    println(f"""{"probe":"pipeline7_recipe","strata":$strata,"alloc_tokens":$spent%.2f,"budget_ok":$budgetOk}""")
    require(budgetOk, "epoch allocation exceeded budget")
    require(strata > 0, "pipeline7 produced no strata")

    // 6. CRASH-INJECTION KILL-POINT MATRIX (r13 VERDICT task 4): the
    // exactly-once claims, exercised by actually crashing the composed
    // flow mid-micro-batch at this sf and resuming on the same
    // checkpoint + store. Each kill point's final gold must match the
    // uninterrupted run's (`served` / `streamedGold`) byte-for-byte.
    //  - append@1: the gold append stream stopped after 1 committed
    //    batch (checkpoint + _spark_metadata mid-stream), resumed;
    //  - store (1, before): crash before any of batch 1's store work;
    //  - store (1, after-apply): crash with the store UPDATED but the
    //    micro-batch uncommitted — restart re-delivers batch 1 and the
    //    manifest ledger must no-op it (the silent-double-count class);
    //  - store (2, after-compact): crash after the auto-compaction
    //    rewrite with the batch uncommitted — re-delivery must no-op
    //    against the compacted tree.
    import graft.streaming.StreamedBatch
    // the crashed run and its resume MUST share one staged input — the
    // file-source checkpoint tracks input files by path, so re-staging
    // on resume would orphan the recorded offsets (stageKey memoizes
    // the staging per JVM)
    val killStage = Some("e2e-kill")
    val killAppend = timed("kill_append_resume") {
      val work = java.nio.file.Files
        .createTempDirectory("e2e-kill-append-").toFile
      StreamedBatch.replayAggregate(spark, events, "ts", "event_id",
        st => Candles.ohlcv(st.withWatermark("ts", "10 minutes"),
          tieCol = Some("event_id")),
        stageKey = killStage,
        stopAfterBatches = Some(1), workDirOpt = Some(work))
      // resume on the same checkpoint/output
      StreamedBatch.replayAggregate(spark, events, "ts", "event_id",
        st => Candles.ohlcv(st.withWatermark("ts", "10 minutes"),
          tieCol = Some("event_id")),
        stageKey = killStage, workDirOpt = Some(work))
    }
    eq("kill_append_vs_uninterrupted", killAppend, streamedGold)

    def injected(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
        .exists(t => String.valueOf(t.getMessage).contains("injected kill"))
    for ((batch, phase) <- Seq((1L, "before"), (1L, "after-apply"),
        (2L, "after-compact"))) {
      val store = java.nio.file.Files
        .createTempDirectory(s"e2e-kill-store-$batch-$phase-").toString
      val work = java.nio.file.Files
        .createTempDirectory(s"e2e-kill-work-$batch-$phase-").toFile
      // the after-compact point must crash after a compaction that
      // actually REWROTE the tree — threshold 1 forces it every batch
      // (the default 64 would make the call a no-op at replay depth)
      val compactEvery = if (phase == "after-compact") 1 else 64
      val crashed =
        try {
          StreamedBatch.replayIntoCandleStore(spark, events, "ts",
            "event_id", store, stageKey = killStage,
            autoCompactVersions = compactEvery,
            killPoint = Some((batch, phase)), workDirOpt = Some(work))
          false
        } catch {
          case e: Throwable if injected(e) => true
        }
      require(crashed, s"kill point ($batch, $phase) did not fire")
      val resumed = timed(s"kill_store_${batch}_$phase") {
        StreamedBatch.replayIntoCandleStore(spark, events, "ts",
          "event_id", store, stageKey = killStage,
          autoCompactVersions = compactEvery, workDirOpt = Some(work))
      }
      eq(s"kill_store_${batch}_${phase}_vs_uninterrupted", resumed, served)
    }

    println(s"""{"probe":"e2e_done","dir":"$dir"}""")
    spark.stop()
  }
}
