package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful threshold alerting — "tell me when the price has moved
  * ≥ `minMove` since the last alert" — the monitoring feature the
  * reference approximates client-side with its per-refresh prev-close
  * delta metric (`src/dashboard/app.py:73-79`), upgraded from "delta
  * since the previous candle" to a true reference-reset alert process.
  *
  * Semantics (per key, rows in (ts, tie) order): the first row seeds a
  * reference price and emits nothing; each later row whose absolute
  * move from the current reference reaches `minMove` emits an alert
  * and RESETS the reference to its own price. This is a sequential
  * recurrence — the reference after row i depends on every prior
  * alert decision — so no window function expresses it; it is the
  * textbook case for per-key custom state.
  *
  * Two executions of the same recurrence:
  *  - [[thresholdAlerts]] (batch): secondary sort — one hash exchange
  *    on the key, a per-partition spillable sort on (key, ts, tie),
  *    then a streaming `mapPartitions` scan that never buffers a
  *    group. Keys run in parallel; each key's scan is inherently
  *    sequential (that IS the semantics).
  *  - [[thresholdAlertsStream]] (streaming): the same recurrence as a
  *    `flatMapGroupsWithState` operator, the reference price carried
  *    in `GroupState` across micro-batches.
  *
  * Scale notes: state per key is ONE double — a billion keys is 8 GB
  * spread over the cluster's state stores. The batch shape's unit of
  * parallelism is the key, so a single pathologically hot key (one
  * symbol holding a whole 100 TB table) serializes; cut such a key
  * into time slices and stitch at the boundaries by re-seeding each
  * slice with the previous slice's final reference (the recurrence is
  * resumable from (ref) alone, which is also why the streaming twin
  * needs only `RefState`). Ordering contract for streaming: rows are
  * sorted WITHIN a micro-batch, but state has already advanced past
  * earlier batches — cross-batch order must come from the source
  * (a topic partitioned by key, or the chronological replay harness),
  * the same per-key-order contract every Kafka stateful consumer
  * relies on.
  */
object Alerts {

  /** Input row for the typed streaming path. */
  case class Trade(symbol: String, ts: Timestamp, tie: Long, price: Double)

  /** Emitted alert: `ref_price` is the reference the move was measured
    * against (the price of the previous alert, or the seed row).
    */
  case class Alert(symbol: String, trade_timestamp: Timestamp, trade_id: Long,
                   price: Double, ref_price: Double, move: Double)

  /** All the state the recurrence needs: the current reference price. */
  case class RefState(ref: Double)

  /** `move` is emitted RAW (`price - ref`, exact IEEE semantics both
    * here and in any SQL oracle); round at the presentation edge, not
    * inside the recurrence.
    */
  private def alertsFor(t: Trade, ref: Double, minMove: Double): Option[Alert] =
    if (math.abs(t.price - ref) >= minMove)
      Some(Alert(t.symbol, t.ts, t.tie, t.price, ref, t.price - ref))
    else None

  /** Project an arbitrary frame to the typed [[Trade]] shape. */
  def trades(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
             priceCol: String): Dataset[Trade] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(priceCol).isNotNull)
      .select(col(keyCol).cast("string").as("symbol"),
        col(tsCol).cast("timestamp").as("ts"),
        col(tieCol).cast("long").as("tie"),
        col(priceCol).cast("double").as("price"))
      .as[Trade]
  }

  /** Batch execution: hash-exchange on symbol, per-partition sort on
    * (symbol, ts, tie), one sequential scan per partition with the
    * reference reset at every symbol boundary. The scan is lazy over
    * the sorted iterator — nothing is materialized per group.
    */
  def thresholdAlerts(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, priceCol: String,
                      minMove: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trades(df, keyCol, tsCol, tieCol, priceCol)
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("ts"), col("tie"))
      .mapPartitions { it =>
        var cur: String = null
        var ref = 0.0
        it.flatMap { t =>
          if (t.symbol != cur) { cur = t.symbol; ref = t.price; Iterator.empty }
          else {
            val out = alertsFor(t, ref, minMove)
            out.foreach(a => ref = a.price)
            out.iterator
          }
        }
      }
      .toDF()
  }

  /** One EWMA output row per input trade. */
  case class EwmaRow(symbol: String, ts: Timestamp, tie: Long,
                     price: Double, ewma: Double)

  /** Exponentially weighted moving average per key — the standard
    * live-dashboard smoothing indicator (the EMA under MACD/signal
    * lines) the reference's plotly panel would compute client-side,
    * here as an engine operator over the full history.
    *
    * Per key in (ts, tie) order: `e_1 = p_1`;
    * `e_i = p_i * alpha + e_{i-1} * (1 - alpha)`. Like the alert
    * process this is a sequential recurrence (every row depends on the
    * whole prefix), NOT a window aggregate — an exponential window
    * frame does not exist in SQL engines — so it runs on the same
    * secondary-sort skeleton as [[thresholdAlerts]]: one hash exchange
    * on the key, spillable per-partition sort, lazy scan carrying one
    * double per key. The raw IEEE recurrence is emitted (rounding
    * inside the recurrence would compound); `1 - alpha` is computed,
    * not a literal, so an oracle writing `(1 - a)` reproduces the
    * bits. Resumable from `(ewma)` alone — the hot-key time-slice
    * stitch described above applies unchanged.
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           priceCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"ewma: alpha out of (0,1]: $alpha")
    val spark = df.sparkSession
    import spark.implicits._
    trades(df, keyCol, tsCol, tieCol, priceCol)
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("ts"), col("tie"))
      .mapPartitions { it =>
        var cur: String = null
        var e = 0.0
        it.map { t =>
          e = if (t.symbol != cur) { cur = t.symbol; t.price }
              else t.price * alpha + e * (1 - alpha)
          EwmaRow(t.symbol, t.ts, t.tie, t.price, e)
        }
      }
      .toDF()
  }

  /** Streaming execution of the same recurrence via
    * `flatMapGroupsWithState` (SURVEY §2.8's custom-state tool): the
    * reference price lives in `GroupState[RefState]` and survives
    * micro-batch boundaries; each batch's rows for a key are sorted
    * (ts, tie) before the scan, so the output is batch-identical
    * whenever the source preserves per-key chronological order across
    * batches. Append output mode: alerts are immutable facts, emitted
    * in the micro-batch that observes them. The per-(key, batch) sort
    * buffers one key's micro-batch slice — bounded by the trigger, not
    * by history.
    */
  def thresholdAlertsStream(input: Dataset[Trade],
                            minMove: Double): Dataset[Alert] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.symbol)
      .flatMapGroupsWithState[RefState, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Trade], state: GroupState[RefState]) =>
          val sorted = rows.toIndexedSeq.sortWith { (a, b) =>
            val c = a.ts.compareTo(b.ts)
            if (c != 0) c < 0 else a.tie < b.tie
          }
          val out = Seq.newBuilder[Alert]
          var ref = state.getOption.map(_.ref)
          sorted.foreach { t =>
            ref match {
              case None => ref = Some(t.price)
              case Some(r) =>
                val a = alertsFor(t, r, minMove)
                a.foreach(out += _)
                a.foreach(x => ref = Some(x.price))
            }
          }
          ref.foreach(r => state.update(RefState(r)))
          out.result().iterator
      }
  }

  /** Streaming twin of [[ewma]]: the smoothed value lives in
    * `GroupState` (one double per key) and the recurrence resumes
    * across micro-batches — `e` after a batch is all the state the
    * process needs (same resumability that powers the hot-key stitch).
    * Emits one row per input trade in the observing batch (append
    * mode; EWMA rows are immutable facts). Same cross-batch per-key
    * ordering contract as [[thresholdAlertsStream]].
    */
  def ewmaStream(input: Dataset[Trade], alpha: Double): Dataset[EwmaRow] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.symbol)
      .flatMapGroupsWithState[RefState, EwmaRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sym: String, rows: Iterator[Trade], state: GroupState[RefState]) =>
          val sorted = rows.toIndexedSeq.sortWith { (a, b) =>
            val c = a.ts.compareTo(b.ts)
            if (c != 0) c < 0 else a.tie < b.tie
          }
          val out = Seq.newBuilder[EwmaRow]
          var e = state.getOption.map(_.ref)
          sorted.foreach { t =>
            val next = e match {
              case None    => t.price
              case Some(p) => t.price * alpha + p * (1 - alpha)
            }
            e = Some(next)
            out += EwmaRow(sym, t.ts, t.tie, t.price, next)
          }
          e.foreach(v => state.update(RefState(v)))
          out.result().iterator
      }
  }
}
