package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // process CPU clock: lets a reader spot contention-corrupted wall
    // times without a re-run — on an otherwise-idle box a parallel query
    // burns cpu ≈ wall×(cores used); when the sandbox is contended, wall
    // inflates while cpu doesn't, so wall ≫ cpu flags the affected rows
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // optional arg: comma-separated query-name substrings to bench (dev
    // loop); the driver invokes with no args = all queries
    val wanted = args.headOption.map(_.split(',').toSeq)
    // alphabetical order: deterministic run order makes per-query
    // timings comparable across rounds (first query pays JVM warmup)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      wanted.forall(_.exists(name.contains))
    }
    // one untimed warm-up (scan + shuffle + agg + codegen) so the
    // alphabetically-first timed query stops absorbing the ~4 s
    // first-job JVM/session cost and per-query timings compare honestly
    // across rounds
    selected.headOption.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // ── null-gate throughput reference (r14 task 1b; reworked r16) ────
    // The r14 drift boards flagged same-code gates at up to 11× CPU
    // because the whole BOX degraded through the session; per-gate
    // bands alone cannot distinguish "this gate regressed" from
    // "everything on this board is slow". The null gate is a fixed
    // synthetic workload (codegen'd hash + aggregate over a constant
    // range — no I/O, no state, byte-identical every round) timed on
    // the SAME board; bands store its reference CPU under "__null__".
    //
    // r16 rework (r15 VERDICT finding 1): the r15 board measured ONE
    // null up front, min-of-3 — a ~1 s burst that happened to land in
    // an uncontended instant while the 32-way gates ran a contended
    // stretch, so normalization scaled gate CPUs UP by 1.66× and
    // flagged 51/233 same-code gates (the same-day quiet-box ledger
    // disproved every one). Two structural fixes:
    //  1. INTERLEAVED nulls — re-measure the 32-partition null every
    //     NULL_EVERY gates, and normalize each gate by the MAX of its
    //     window's bounding nulls (the most-contended local estimate),
    //     so the reference samples the same contention the gate ran
    //     under instead of one lucky instant (~15 extra ~1 s bursts on
    //     a ~280 s board).
    //  2. ONE-SIDED scaling — the null may only DISCOUNT a slow box
    //     (scale = min(1, bandNull/windowNull)); scaling measurements
    //     UP off a fast null is exactly the observed failure mode, and
    //     a genuinely fast box needs no help: its gates measure at or
    //     under band on their own.
    def measureNull(parts: Int, rows: Long): Double = {
      val c0 = osBean.getProcessCpuTime
      // bit_xor, not sum: summing 64M hashes overflows Long under the
      // ANSI default; xor is overflow-free and equally codegen'd
      spark.range(0L, rows, 1L, numPartitions = parts)
        .selectExpr("bit_xor(xxhash64(id)) AS h").collect()
      (osBean.getProcessCpuTime - c0) / 1e9
    }
    val nullEvery = 16
    // a SERIAL null alongside the parallel one: the two contention
    // classes (one core vs all cores) degrade differently under
    // co-resident load — reported in the JSON so a reader can tell a
    // single-thread slowdown from a box-wide one (diagnostic only; all
    // gates normalize by the parallel null, their own class)
    val nullSerial = (1 to 2).map(_ => measureNull(1, 4L * 1000 * 1000)).min
    val nullWindows = scala.collection.mutable.ArrayBuffer(
      measureNull(32, 64L * 1000 * 1000))
    // each query runs TWICE and reports the min: single-shot timings on
    // a shared sandbox vary 2-4× with CPU contention/GC (round 4's
    // driver file showed 17× phantom regressions on untouched queries),
    // and min-of-2 is the cheapest estimator that discards a one-off
    // contention spike while still timing a cold-cache execution both
    // times (nothing is persisted between the two runs)
    // a throwing query is still timed (its cost is real) but is named
    // in the errors list — r12 found three heavy-hitter gates whose
    // board lines had been cost-WITHOUT-answer for two rounds because
    // this catch was silent
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = selected.zipWithIndex.map { case ((name, fn), qi) =>
      val runs = (1 to 2).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => errors += name }
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      if ((qi + 1) % nullEvery == 0)
        nullWindows += measureNull(32, 64L * 1000 * 1000)
      // cpu is reported for the SAME run the wall time comes from
      (name, runs.minBy(_._1), qi / nullEvery)
    }
    // close the final window so every gate has a null on both sides
    if (selected.size % nullEvery != 0)
      nullWindows += measureNull(32, 64L * 1000 * 1000)
    // the board's best throughput estimate — what a band reseed records
    val nullCpu = nullWindows.min
    def fmt(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val qs = results.map { case (k, (w, _), _) => s"\"" + k + "\":" + fmt(w) }
      .mkString("{", ",", "}")
    val cpu = results.map { case (k, (_, c), _) => s"\"" + k + "\":" + fmt(c) }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val totalCpu = results.map(_._2._2).sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // ── drift verdict (r13 VERDICT task 5) ────────────────────────────
    // Wall times on this box drift ±20-30% between windows, so every
    // cross-round wall comparison needed hand attribution. The
    // listener-measured per-gate PROCESS CPU is the stable signal
    // (load-invariant on an otherwise-idle box): bench_bands.json pins
    // each gate's reference CPU (a prior board's queries_cpu_sec map,
    // refreshed when a gate legitimately changes shape), and a gate is
    // FLAGGED only when its measured CPU moves past 1.5x its band with
    // an absolute floor of 1.5 s — calibrated on the empirical null:
    // two same-code boards 40 min apart moved three 1-2 s gates by
    // 0.9-1.2 s (contention jitter), and a 0.5 s floor flagged all
    // three; at 1.5 s the same-code false-flag rate is 0/224 while a
    // real regression of the r12 class (several CPU-seconds on a
    // multi-second gate) still trips both conditions.
    // The verdict is machine-readable in both JSON lines, so a judge
    // can diff rounds without re-running solo probes.
    val bandFile = new java.io.File("bench_bands.json")
    val bands: Map[String, Double] =
      if (!bandFile.exists()) Map.empty
      else {
        // flat {"gate": cpu, ...} — parsed with the json4s that ships
        // on the Spark classpath
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        JsonMethods.parse(new String(
            java.nio.file.Files.readAllBytes(bandFile.toPath), "UTF-8"))
          .asInstanceOf[JObject].obj.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JInt(v))    => k -> v.toDouble
            case (k, JDecimal(v)) => k -> v.toDouble
          }.toMap
      }
    // normalize by the gate's WINDOW null when both boards measured
    // one: a gate is flagged only when its CPU moved past 1.5× its
    // band AFTER discounting the contention its own window measured —
    // and the discount is ONE-SIDED (capped at 1.0): the null may
    // excuse a slow box, never amplify a fast instant into phantom
    // flags (the r15 51/233 failure)
    val bandNull = bands.get("__null__").filter(_ > 0)
    def windowScale(w: Int): Double = {
      val local = math.max(nullWindows(w),
        nullWindows(math.min(w + 1, nullWindows.length - 1)))
      bandNull.map(b => math.min(1.0, b / math.max(local, 1e-9))).getOrElse(1.0)
    }
    val flagged = results.flatMap { case (name, (_, c), w) =>
      bands.get(name).collect {
        case band if c * windowScale(w) > band * 1.5 &&
            c * windowScale(w) - band > 1.5 =>
          (name, band, c, windowScale(w))
      }
    }
    def f2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val flaggedJson = flagged.map { case (n, b, c, s) =>
      s"\"" + n + s"\":{\"band\":${f2(b)},\"cpu\":${f2(c)},\"scale\":${f2(s)}}"
    }.mkString("{", ",", "}")
    val windowsJson = nullWindows.map(f2).mkString("[", ",", "]")
    val driftJson = s"""{"band_file":"bench_bands.json",""" +
      s""""bands_known":${bands.size},"cpu_flagged":$flaggedJson,""" +
      s""""n_flagged":${flagged.size},"null_cpu":${f2(nullCpu)},""" +
      s""""null_serial":${f2(nullSerial)},""" +
      s""""null_windows":$windowsJson}"""
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""queries":$qs,"queries_cpu_sec":$cpu,"total_cpu_sec":${fmt(totalCpu)},""" +
      s""""errors":$errJson,"drift":$driftJson,"cpus":$cpus,"sf":"$sfDir"}"""
    // the driver keeps only the LAST 2000 chars of output and parses the
    // JSON line out of that tail; with 100+ queries the full per-query map
    // is ~3.5 KB, so every round's `parsed` came back null (BENCH_r07/r08).
    // Print a COMPACT line — headline query per family + totals — that fits
    // the tail with room for sbt's closing "[success]" line, and keep the
    // complete map in BENCH_SELF.json for the judge.
    val headline = Seq(
      "q1_pricing_summary", "q5_local_supplier", "q_profile_events",
      "gold_candles_1m", "gold_vwap_true", "serve_latest_per_symbol",
      "serve_spread_join", "stream_gold_candles_1m", "stream_spread_join",
      "dedup_exact_rows", "dedup_minhash_lsh", "dedup_ngram_jaccard",
      "dedup_components", "sim_topk_bruteforce", "sim_topk_ivf",
      "sim_topk_ivfpq", "sim_topk_ann_index", "sim_knn_join", "sim_lsh_scaled",
      "text_token_stats", "text_tfidf_topterms", "text_bpe_merges",
      "cur_shuffle", "cur_pipeline", "mm_image_decode",
      "q_merge_upsert", "q_merge_read_range", "stream_apply_changes",
      "cur_semantic_prototypes")
    val resMap = results.map { case (k, wc, _) => k -> wc }.toMap
    // each headline query carries {w: wall sec, c: process-cpu sec} so a
    // reader can split latency from load (wall ≫ cpu/cores = stage
    // latency or contention, not compute) without opening BENCH_SELF
    val hq = headline.flatMap(k => resMap.get(k).map { case (w, c) =>
      def f3(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      s"\"" + k + s"\":{\"w\":${f3(w)},\"c\":${f3(c)}}"
    }).mkString("{", ",", "}")
    // compact drift: flagged names only (normally empty) — the full
    // band/cpu pairs live in BENCH_SELF.json
    val compactDrift = s"""{"bands_known":${bands.size},""" +
      s""""n_flagged":${flagged.size},"cpu_flagged":[""" +
      flagged.take(8).map("\"" + _._1 + "\"").mkString(",") + "]}"
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
      s""""queries":$hq,"total_cpu_sec":${fmt(totalCpu)},""" +
      s""""n_queries":${results.size},"n_errors":${errors.size},""" +
      s""""drift":$compactDrift,""" +
      s""""full":"BENCH_SELF.json",""" +
      s""""cpus":$cpus,"sf":"$sfDir"}"""
    println(compact)
    spark.stop()
    // self-diagnosing output: BENCH_r05's `parsed` was null because the
    // driver failed to extract the JSON from the sbt tail (log lines can
    // splice into a println mid-flight). Re-emit AFTER spark.stop() —
    // when no executor/logging thread is writing — on a grep-stable
    // sentinel line, and persist a file copy the judge can always read.
    Console.out.flush()
    println(s"GRAFT_BENCH_JSON $compact")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SELF.json"),
        (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
  }
}
