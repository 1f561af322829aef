package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Serving/inspection queries — the analytics the reference computes
  * client-side in pandas (`src/dashboard/app.py:57-79`) and via the
  * check_* scripts, re-expressed as real Spark queries so they run
  * where the data lives (SURVEY.md §2.3 P9, §2.5, §2.6).
  *
  * Scale notes: latest-per-key and lag are window functions partitioned
  * by symbol — they shuffle once on the partition key and never collect
  * to the driver. Top-k compiles to TakeOrderedAndProject (no global
  * sort materialization).
  */
object Serving {

  /** Latest row per symbol — pandas `iloc[-1]` (`dashboard/app.py:70`)
    * as `row_number() OVER (PARTITION BY symbol ORDER BY ts DESC) = 1`.
    * `tieCols` break equal timestamps deterministically (descending),
    * so row selection is stable across partitionings and engines.
    */
  def latestPerKey(df: DataFrame, keyCol: String, tsCol: String,
                   tieCols: String*): DataFrame = {
    val ord = (tsCol +: tieCols).map(col(_).desc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Previous-close delta per symbol — pandas prev-close computation
    * (`dashboard/app.py:73-79`) as `lag() OVER`.
    * Input: a candles frame from [[Candles.ohlcv]].
    */
  def prevCloseDelta(candles: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    candles
      .withColumn("prev_close", lag(col("close"), 1).over(w))
      .withColumn("close_delta", round(col("close") - col("prev_close"), 6))
      .select(col("window_start"), col("symbol"), col("close"),
        col("prev_close"), col("close_delta"))
  }

  /** Top-k most recent rows — `check_gold.py:16` orderBy+show pattern;
    * compiles to TakeOrderedAndProject, not a global sort. `tieCols`
    * make the cut line deterministic when timestamps collide.
    */
  def topKRecent(df: DataFrame, tsCol: String, k: Int,
                 tieCols: String*): DataFrame =
    df.orderBy((tsCol +: tieCols).map(col(_).desc): _*).limit(k)

  /** Distinct symbols — pandas `unique()` (`dashboard/app.py:57`). */
  def distinctKeys(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol)).distinct()

  /** Per-event trailing-window statistics: for every trade, the count /
    * mean / max of prices over the PRECEDING `windowMs` of event time
    * within its symbol — the dashboard's "last 5 minutes" tiles
    * computed event-aligned instead of grid-aligned (a tumbling candle
    * can't answer "as of THIS trade").
    *
    * A time-RANGE window frame, not ROWS: peers are selected by
    * event-time distance (`unix_millis` — exact integer milliseconds,
    * no float epoch drift), so ties and bursts are handled identically
    * under any partitioning. Scale shape: one shuffle on the symbol
    * key; the frame walk is the sliding-window merge within each
    * sorted partition. Symbol-skewed streams should pre-bucket time
    * (as [[graft.streaming.Medallion.streamSpreadBucketed]] does) —
    * here we keep the canonical serving shape, matching
    * [[latestPerKey]] / [[prevCloseDelta]].
    */
  def rollingStats(events: DataFrame, windowMs: Long = 300000L,
                   tsCol: String = "ts", symbolCol: String = "event_type",
                   priceCol: String = "value", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(symbolCol))
      .orderBy(unix_millis(col(tsCol)))
      .rangeBetween(-windowMs, Window.currentRow)
    events.select(
      col(idCol).as("event_id"), col(symbolCol).as("symbol"),
      col(tsCol).as("ts"), col(priceCol).as("value"),
      count(lit(1)).over(w).as("roll_cnt"),
      round(avg(col(priceCol)).over(w), 6).as("roll_avg"),
      max(col(priceCol)).over(w).as("roll_max"))
  }

  /** Cross-symbol spread per window: the arbitrage query the reference
    * promises but never built (SURVEY.md §2.7 / README title). For each
    * time window, the widest close-price gap across symbols, with the
    * symbols realizing it. Single grouped agg — no join needed.
    */
  def spreadByWindow(candles: DataFrame): DataFrame =
    candles.groupBy(col("window_start"))
      .agg(
        round(max(col("close")) - min(col("close")), 6).as("spread"),
        // struct tiebreak: among equal closes the max/min symbol wins —
        // deterministic under any partitioning
        max_by(col("symbol"), struct(col("close"), col("symbol"))).as("rich_symbol"),
        min_by(col("symbol"), struct(col("close"), col("symbol"))).as("cheap_symbol"),
        count(lit(1)).as("n_symbols"))
      .filter(col("n_symbols") > 1)

  /** Top-k rows per key WITHOUT sorting — the custom-operator stack
    * ([[graft.plans.TopKPerKeyPlan]] logical node + strategy + two
    * bounded-heap physical phases). The `row_number() OVER (...)`
    * formulation ([[latestPerKey]]) fully sorts each partition; this
    * touches every row once, map-side-combines to ≤ k rows per key per
    * partition, and shuffles only those. Order columns are DESCENDING
    * (append further tiebreak columns for determinism). Output is the
    * exact top-k row set per key (unsorted within the key).
    */
  def topKPerKey(df: DataFrame, k: Int, keyCols: Seq[String],
                 orderDescCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Descending, NullsLast, SortOrder}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.plans.{TopKPerKeyPlan, TopKPerKeyStrategy}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val node = TopKPerKeyPlan(k,
      keyCols.map(UnresolvedAttribute(_)),
      orderDescCols.map(c => SortOrder(UnresolvedAttribute(c), Descending, NullsLast, Seq.empty)),
      df.queryExecution.logical)
    ColumnBridge.ofRows(spark, node)
  }

  /** AS-OF join — an operator Spark has no native form of: for every
    * left row, attach the single most recent right row with the same
    * key and `rightTs <= leftTs`. The naive formulation is an
    * inequality join + per-row argmax (quadratic per key); this is the
    * scalable composition: tag and UNION both sides, one window pass
    * per key ordered by (ts, side) carrying the last-seen right payload
    * forward (`last_value(..., ignoreNulls)`), keep left rows. ONE
    * shuffle on the key — the same cost as any keyed window — and no
    * row-pair blowup, at any scale.
    *
    * Right rows sort before left rows at equal timestamps, giving the
    * standard inclusive (`<=`) as-of semantics; `rightCols` are the
    * payload columns to carry (each emitted as `asof_<name>`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = rightCols.map(c => col(c).as(s"asof_$c"))
    val rTagged = right.select(
      (col(keyCol).as(keyCol) +: col(rightTsCol).cast("timestamp").as("__ts") +:
        lit(0).as("__side") +: payload) ++
        leftCols.filterNot(c => c == keyCol).map(c => lit(null).as(c)): _*)
    val lTagged = left.select(
      (col(keyCol).as(keyCol) +: col(leftTsCol).cast("timestamp").as("__ts") +:
        lit(1).as("__side") +: rightCols.map(c => lit(null).as(s"asof_$c"))) ++
        leftCols.filterNot(c => c == keyCol).map(col): _*)
    val unioned = rTagged.unionByName(lTagged)
    // right (__side=0) sorts before left at equal ts => inclusive match
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col(s"asof_$c")): _*)
  }

  /** Range (interval) join — each left row matched to every right
    * interval `[startCol, endCol)` of the same key containing its
    * timestamp. The naive plan is an inequality join (a nested-loop
    * product); this is the scalable binned composition: each interval
    * is exploded onto the fixed-width time bins it covers, the join is
    * a plain equi-join on (key, bin), and the exact containment filter
    * runs on bin-local candidates. Shuffle is O(rows + intervals ×
    * bins-per-interval) on (key, bin) — pick `binWidthSec` near the
    * typical interval length so that factor stays small.
    */
  def rangeJoin(left: DataFrame, leftTsCol: String,
                right: DataFrame, startCol: String, endCol: String,
                keyCol: String, binWidthSec: Long): DataFrame = {
    val bin = (c: Column) => floor(unix_timestamp(c) / binWidthSec)
    val rBinned = right.withColumn("__bin",
      explode(sequence(bin(col(startCol)),
        // end is exclusive: a zero-length interval still covers its bin
        bin(greatest(col(endCol) - expr("INTERVAL 1 MICROSECOND"), col(startCol))))))
    val lBinned = left.withColumn("__bin", bin(col(leftTsCol)))
    lBinned.join(rBinned, Seq(keyCol, "__bin"))
      .filter(col(leftTsCol) >= col(startCol) && col(leftTsCol) < col(endCol))
      .drop("__bin")
  }

  /** Spread as an explicit self-join of two candle series on the window
    * — the stream-stream-join-shaped formulation (exercises the join
    * path; equi-join on window_start, broadcastable when one leg is a
    * single symbol's series).
    */
  def spreadJoin(candles: DataFrame, symbolA: String, symbolB: String): DataFrame = {
    val a = candles.filter(col("symbol") === symbolA)
      .select(col("window_start"), col("close").as("close_a"))
    val b = candles.filter(col("symbol") === symbolB)
      .select(col("window_start"), col("close").as("close_b"))
    a.join(b, Seq("window_start"))
      .select(col("window_start"), col("close_a"), col("close_b"),
        round(col("close_a") - col("close_b"), 6).as("spread"))
  }

  /** The reference's TITLE computation as a first-class serving
    * operator: actionable arbitrage opportunities — aligned-window
    * cross-venue spreads whose relative magnitude clears `minBps`
    * basis points of the mid price — with the buy side called out
    * (buy where it's cheaper). One window-aligned equi-join
    * ([[spreadJoin]]) plus a map-only filter; at scale both sides
    * shuffle once on window_start and everything after is narrow.
    */
  def arbitrageOpportunities(candles: DataFrame, symbolA: String,
                             symbolB: String, minBps: Double): DataFrame =
    spreadJoin(candles, symbolA, symbolB)
      .withColumn("spread_bps",
        round(abs(col("spread")) / ((col("close_a") + col("close_b")) / 2) * 10000, 6))
      .filter(col("spread_bps") >= minBps)
      .withColumn("buy_side",
        when(col("close_a") < col("close_b"), lit(symbolA)).otherwise(lit(symbolB)))
      .select(col("window_start"), col("close_a"), col("close_b"),
        col("spread"), col("spread_bps"), col("buy_side"))

  /** Funnel analysis — how many users complete each ORDERED prefix of
    * `stages` (stage i+1 counts only events strictly AFTER the user's
    * earliest completion of stage i; the classic conversion query).
    * Returns one row per stage: `(stage_idx, stage, n_users)` with
    * `n_users` monotonically non-increasing by construction.
    *
    * Shape: one grouped conditional-min per stage, each keyed by the
    * user — N stages = N user-keyed aggregations over the events table
    * (the per-stage thresholds are functional on the user and ride the
    * grouping key, so no window and no per-user sort materializes;
    * every agg partial-aggregates map-side). At corpus scale the
    * events scan per stage is the cost — pre-filtering to
    * `typeCol IN stages` is pushed to the scan, and a persisted
    * user-bucketed layout removes the per-stage exchange.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: no stages")
    val relevant = events.filter(col(typeCol).isin(stages: _*))
      .select(col(userCol), col(typeCol), col(tsCol))
    var g = relevant.groupBy(col(userCol))
      .agg(min(when(col(typeCol) === stages.head, col(tsCol))).as("t0"))
    for (i <- 1 until stages.length) {
      val prev = (0 until i).map(j => s"t$j")
      g = relevant.join(g, userCol)
        .groupBy((userCol +: prev).map(col): _*)
        .agg(min(when(col(typeCol) === stages(i) &&
          col(tsCol) > col(s"t${i - 1}"), col(tsCol))).as(s"t$i"))
    }
    val counts = g.agg(
      count(col("t0")).as("c0"),
      (1 until stages.length).map(i => count(col(s"t$i")).as(s"c$i")): _*
    ).head()
    val spark = events.sparkSession
    import spark.implicits._
    stages.zipWithIndex.map { case (st, i) =>
      (i + 1, st, counts.getLong(i))
    }.toDF("stage_idx", "stage", "n_users")
  }

  /** Cohort retention — users grouped by their FIRST active date, and
    * for each cohort, how many return on each later day:
    * `(cohort_date, day_offset, n_users)` (offset 0 row = cohort
    * size). The other classic product-analytics table next to
    * [[funnel]].
    *
    * Shape: distinct (user, date) first (collapses event volume to
    * active-days — the 100 TB saver), one user-keyed min for cohorts,
    * one key join back, one grouped count. `n_users` counts rows of an
    * already-distinct frame, so no countDistinct shuffle.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val active = events
      .select(col(userCol), to_date(col(tsCol)).as("d")).distinct()
    val cohort = active.groupBy(col(userCol))
      .agg(min(col("d")).as("cohort_date"))
    active.join(cohort, userCol)
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")))
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Time-weighted average price per symbol — each tick weighted by
    * how long it was the live price (micros to the next tick; the last
    * tick has no holding interval and contributes nothing). The
    * finance sibling of VWAP: robust to burst-y tick arrival where a
    * plain mean over-weights busy moments. One symbol-sharded `lead`
    * window + one grouped sum; durations are exact integer micros, so
    * only the final division is floating.
    */
  def twap(events: DataFrame, symbolCol: String = "event_type",
           tsCol: String = "ts", priceCol: String = "value",
           tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(symbolCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__u", unix_micros(col(tsCol)))
      .withColumn("__nxt", lead(col("__u"), 1).over(w))
      .filter(col("__nxt").isNotNull)
      .groupBy(col(symbolCol).as("symbol"))
      .agg(round(sum(col(priceCol) * (col("__nxt") - col("__u"))) /
        sum(col("__nxt") - col("__u")), 6).as("twap"))
  }

  /** Pearson correlation of two symbols' window-aligned close prices —
    * the co-movement statistic behind pair selection for arbitrage and
    * hedging. One window-aligned equi-join of the two candle series
    * ([[spreadJoin]]'s shape) + one `corr` aggregate; emits the
    * aligned-window count so a thin overlap is visible next to the
    * coefficient.
    */
  def pairCorrelation(candles: DataFrame, symbolA: String,
                      symbolB: String): DataFrame = {
    val a = candles.filter(col("symbol") === symbolA)
      .select(col("window_start"), col("close").as("close_a"))
    val b = candles.filter(col("symbol") === symbolB)
      .select(col("window_start"), col("close").as("close_b"))
    a.join(b, Seq("window_start"))
      .agg(count(lit(1)).as("n_windows"),
        round(corr(col("close_a"), col("close_b")), 6).as("correlation"))
      .select(lit(symbolA).as("symbol_a"), lit(symbolB).as("symbol_b"),
        col("n_windows"), col("correlation"))
  }

  /** Maximum drawdown per symbol — the deepest peak-to-trough loss of
    * the chronological price path (`min(p / running_max − 1)`), the
    * risk statistic every trading dashboard carries next to TWAP/VWAP.
    * One symbol-sharded running-max window + one grouped min. The
    * frame is RANGE (peers included): a ROWS frame would make each
    * tied-timestamp row's peak depend on arbitrary tie order, while
    * the peer-inclusive peak is deterministic — simultaneous ticks see
    * each other.
    */
  def maxDrawdown(events: DataFrame, symbolCol: String = "event_type",
                  tsCol: String = "ts", priceCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(symbolCol)).orderBy(col(tsCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__peak", max(col(priceCol)).over(w))
      .groupBy(col(symbolCol).as("symbol"))
      .agg(round(min(col(priceCol) / col("__peak") - 1.0), 6).as("max_drawdown"))
  }

  /** Event-flow transition matrix — for every consecutive pair of a
    * user's events (chronological, `tieCol` breaks equal timestamps
    * deterministically), count the `(from_type, to_type)` transition:
    * the Sankey/next-step table behind user-journey analytics. One
    * user-partitioned `lead` window (sharded by user — never global)
    * plus one grouped count.
    */
  def eventTransitions(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events.select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("next_type", lead(col(typeCol), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-key z-score outliers: rows whose value sits more than
    * `zMax` sample standard deviations from their key's mean. Keyed
    * stats are one grouped agg broadcast back; the flagging filter is
    * map-only. z is ROUNDED (6dp) before the threshold compare, so
    * both engines cut on the identical number.
    */
  def outlierZscores(events: DataFrame, keyCol: String, valCol: String,
                     zMax: Double = 3.0): DataFrame = {
    val stats = events.groupBy(col(keyCol))
      .agg(avg(col(valCol)).as("__mu"), stddev_samp(col(valCol)).as("__sd"))
    events.join(broadcast(stats), keyCol)
      .withColumn("z", round((col(valCol) - col("__mu")) / col("__sd"), 6))
      .filter(abs(col("z")) > zMax)
      .drop("__mu", "__sd")
  }
}
