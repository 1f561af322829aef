package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class CandlesSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    // window 10:00: BTC open=100 (earliest), close=103 (latest), high=105, low=99
    (1L, ts("2026-01-01 10:00:05"), "BTC", 100.0),
    (2L, ts("2026-01-01 10:00:20"), "BTC", 105.0),
    (3L, ts("2026-01-01 10:00:30"), "BTC", 99.0),
    (4L, ts("2026-01-01 10:00:50"), "BTC", 103.0),
    // window 10:01: single trade
    (5L, ts("2026-01-01 10:01:10"), "BTC", 110.0),
    // other symbol same window
    (6L, ts("2026-01-01 10:00:15"), "ETH", 10.0)
  ).toDF("event_id", "ts", "event_type", "value")

  test("ohlcv: exact open/high/low/close/count per (window, symbol)") {
    val c = Candles.ohlcv(trades).orderBy("symbol", "window_start")
      .select("symbol", "open", "high", "low", "close", "trade_count")
      .as[(String, Double, Double, Double, Double, Long)].collect()
    c(0) shouldBe (("BTC", 100.0, 105.0, 99.0, 103.0, 4L))
    c(1) shouldBe (("BTC", 110.0, 110.0, 110.0, 110.0, 1L))
    c(2) shouldBe (("ETH", 10.0, 10.0, 10.0, 10.0, 1L))
  }

  test("ohlcv invariants hold on real data (FIXTURES.md §4)") {
    val ev = graft.util.Tables.events(spark, "/root/testdata/sf0.001")
    val c = Candles.ohlcv(ev)
    c.filter(col("high") < greatest(col("open"), col("close"))).count() shouldBe 0
    c.filter(col("low") > least(col("open"), col("close"))).count() shouldBe 0
    c.filter(col("window_end") =!= col("window_start") + expr("INTERVAL 1 MINUTE"))
      .count() shouldBe 0
    // exactly one row per (window_start, symbol)
    c.groupBy("window_start", "symbol").count().filter(col("count") > 1).count() shouldBe 0
    // trade_count conservation
    c.agg(sum("trade_count")).as[Long].head() shouldBe ev.count()
  }

  test("ohlcv is invariant under input row order") {
    val shuffled = trades.orderBy(rand(7))
    val a = Candles.ohlcv(trades).orderBy("symbol", "window_start").collect()
    val b = Candles.ohlcv(shuffled).orderBy("symbol", "window_start").collect()
    a shouldBe b
  }

  test("sliding candles: each trade lands in windowDur/slideDur windows") {
    val c = Candles.ohlcvSliding(trades, "2 minutes", "1 minute", tieCol = Some("event_id"))
    c.agg(sum("trade_count")).as[Long].head() shouldBe trades.count() * 2
    // the 10:00-10:02 window sees both the 10:00 and 10:01 BTC trades
    val w = c.filter(col("window_start") === ts("2026-01-01 10:00:00") &&
      col("symbol") === "BTC").head()
    w.getAs[Long]("trade_count") shouldBe 5L
    w.getAs[Double]("close") shouldBe 110.0
  }

  test("sessions merge events within the gap and split on it") {
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), 7L, 1.0),
      (2L, ts("2026-01-01 10:20:00"), 7L, 2.0), // 20min gap: same session
      (3L, ts("2026-01-01 11:00:00"), 7L, 3.0), // 40min gap: new session
      (4L, ts("2026-01-01 10:00:00"), 8L, 4.0)  // other user
    ).toDF("event_id", "ts", "user_id", "value")
    val s = Candles.sessions(ev, "30 minutes").orderBy("user_id", "session_start")
      .select("user_id", "n_events", "sum_value")
      .as[(Long, Long, Double)].collect()
    s shouldBe Array((7L, 2L, 3.0), (7L, 1L, 3.0), (8L, 1L, 4.0))
  }

  test("typed VWAP Aggregator matches the built-in sum/sum formulation") {
    val ev = graft.util.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("vol", get_json_object(col("props"), "$.k").cast("double"))
      .filter(col("vol") > 0)
    val vwap = udaf(VwapAggregator)
    val typed = ev.groupBy("event_type")
      .agg(round(vwap(col("value"), col("vol")), 6).as("v"))
    val builtin = ev.groupBy("event_type")
      .agg(round(sum(col("value") * col("vol")) / sum(col("vol")), 6).as("v"))
    typed.orderBy("event_type").collect() shouldBe builtin.orderBy("event_type").collect()
  }

  test("vwapTrue weights by volume") {
    val df = Seq(
      (ts("2026-01-01 10:00:05"), "BTC", 100.0, 1.0),
      (ts("2026-01-01 10:00:10"), "BTC", 200.0, 3.0)
    ).toDF("ts", "event_type", "value", "vol")
    val v = Candles.vwapTrue(df, col("vol"))
      .select("vwap").as[Double].head()
    v shouldBe (100.0 * 1 + 200.0 * 3) / 4.0 +- 1e-9
  }
}
