package graft.operators

import org.apache.spark.sql.DataFrame
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
}
