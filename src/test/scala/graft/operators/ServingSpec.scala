package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

class ServingSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("latestPerKey breaks timestamp ties deterministically") {
    val df = Seq(
      (1L, ts("2026-01-01 10:00:00"), "BTC"),
      (2L, ts("2026-01-01 10:00:00"), "BTC"), // same ts, higher id wins
      (3L, ts("2026-01-01 09:00:00"), "ETH")
    ).toDF("event_id", "ts", "symbol")
    val out = Serving.latestPerKey(df, "symbol", "ts", "event_id")
      .orderBy("symbol").select("event_id").as[Long].collect()
    out shouldBe Array(2L, 3L)
  }

  test("rollingStats: trailing time-range frame, boundary inclusive") {
    val df = Seq(
      (1L, ts("2026-01-01 10:00:00"), "BTC", 100.0),
      (2L, ts("2026-01-01 10:01:40"), "BTC", 110.0),
      (3L, ts("2026-01-01 10:06:40"), "BTC", 120.0), // exactly 300s after #2
      (4L, ts("2026-01-01 10:00:00"), "ETH", 5.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = Serving.rollingStats(df).orderBy("event_id")
      .select("roll_cnt", "roll_avg", "roll_max")
      .as[(Long, Double, Double)].collect()
    out(0) shouldBe ((1L, 100.0, 100.0))
    out(1) shouldBe ((2L, 105.0, 110.0))
    out(2) shouldBe ((2L, 115.0, 120.0)) // #1 aged out, #2 on the 300s edge stays
    out(3) shouldBe ((1L, 5.0, 5.0))     // other symbol isolated
  }

  test("topKRecent returns k rows, newest first, id tiebreak") {
    val df = Seq(
      (1L, ts("2026-01-01 10:00:00")),
      (2L, ts("2026-01-01 10:00:00")),
      (3L, ts("2026-01-01 11:00:00"))
    ).toDF("event_id", "ts")
    Serving.topKRecent(df, "ts", 2, "event_id")
      .select("event_id").as[Long].collect() shouldBe Array(3L, 2L)
  }

  test("prevCloseDelta lags within symbol") {
    val candles = Seq(
      (ts("2026-01-01 10:00:00"), "BTC", 100.0),
      (ts("2026-01-01 10:01:00"), "BTC", 105.0),
      (ts("2026-01-01 10:00:00"), "ETH", 10.0)
    ).toDF("window_start", "symbol", "close")
    val out = Serving.prevCloseDelta(candles)
      .orderBy("symbol", "window_start")
      .select("close_delta").as[Option[Double]].collect()
    out shouldBe Array(None, Some(5.0), None)
  }

  test("spreadByWindow picks richest/cheapest symbols deterministically") {
    val candles = Seq(
      (ts("2026-01-01 10:00:00"), "BTC", 100.0),
      (ts("2026-01-01 10:00:00"), "ETH", 90.0),
      (ts("2026-01-01 10:00:00"), "SOL", 95.0),
      (ts("2026-01-01 10:01:00"), "BTC", 50.0) // single-symbol window dropped
    ).toDF("window_start", "symbol", "close")
    val out = Serving.spreadByWindow(candles).collect()
    out.length shouldBe 1
    out(0).getAs[Double]("spread") shouldBe 10.0
    out(0).getAs[String]("rich_symbol") shouldBe "BTC"
    out(0).getAs[String]("cheap_symbol") shouldBe "ETH"
  }

  test("asofJoin attaches the most recent right row at-or-before each left ts") {
    val left = Seq(
      (1L, ts("2026-01-01 10:05:00"), "BTC"),
      (2L, ts("2026-01-01 10:10:00"), "BTC"),
      (3L, ts("2026-01-01 09:00:00"), "BTC"), // before any right row
      (4L, ts("2026-01-01 10:00:00"), "ETH")  // equal-ts inclusive match
    ).toDF("event_id", "ts", "symbol")
    val right = Seq(
      (ts("2026-01-01 10:00:00"), "BTC", 100.0),
      (ts("2026-01-01 10:08:00"), "BTC", 108.0),
      (ts("2026-01-01 10:00:00"), "ETH", 10.0)
    ).toDF("rts", "symbol", "close")
    val out = Serving.asofJoin(left, right, "symbol", "ts", "rts", Seq("close"))
      .orderBy("event_id").select("asof_close").as[Option[Double]].collect()
    out shouldBe Array(Some(100.0), Some(108.0), None, Some(10.0))
  }

  test("rangeJoin matches rows to every containing interval, across bin boundaries") {
    val left = Seq(
      (1L, ts("2026-01-01 10:05:00"), "BTC"),
      (2L, ts("2026-01-01 11:59:00"), "BTC"),
      (3L, ts("2026-01-01 13:00:00"), "BTC") // end-exclusive: no match
    ).toDF("event_id", "ts", "symbol")
    val right = Seq(
      ("BTC", ts("2026-01-01 10:00:00"), ts("2026-01-01 12:00:00"), "a"),
      ("BTC", ts("2026-01-01 11:00:00"), ts("2026-01-01 13:00:00"), "b"),
      ("ETH", ts("2026-01-01 10:00:00"), ts("2026-01-01 12:00:00"), "c")
    ).toDF("symbol", "start", "end", "tag")
    val out = Serving.rangeJoin(left, "ts", right, "start", "end", "symbol", 1800L)
      .select("event_id", "tag").as[(Long, String)].collect().sorted
    out shouldBe Array((1L, "a"), (2L, "a"), (2L, "b"))
  }

  test("rangeJoin result independent of bin width") {
    val left = Seq((1L, ts("2026-01-01 10:05:00"), "BTC"),
      (2L, ts("2026-01-01 11:30:00"), "BTC")).toDF("event_id", "ts", "symbol")
    val right = Seq(("BTC", ts("2026-01-01 10:00:00"), ts("2026-01-01 12:00:00"), "a"))
      .toDF("symbol", "start", "end", "tag")
    Seq(60L, 3600L, 86400L).foreach { bw =>
      Serving.rangeJoin(left, "ts", right, "start", "end", "symbol", bw)
        .count() shouldBe 2
    }
  }

  test("spreadJoin aligns two symbol series on window") {
    val candles = Seq(
      (ts("2026-01-01 10:00:00"), "BTC", 100.0),
      (ts("2026-01-01 10:00:00"), "ETH", 90.0),
      (ts("2026-01-01 10:01:00"), "BTC", 101.0) // no ETH -> dropped
    ).toDF("window_start", "symbol", "close")
    val out = Serving.spreadJoin(candles, "BTC", "ETH").collect()
    out.length shouldBe 1
    out(0).getAs[Double]("spread") shouldBe 10.0
  }

  test("twap weights each tick by its holding interval; the last tick " +
      "contributes nothing") {
    // BTC: 100 held 10s, then 200 held 30s, then 300 (no interval)
    // twap = (100*10 + 200*30) / 40 = 175
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), "BTC", 100.0),
      (2L, ts("2026-01-01 10:00:10"), "BTC", 200.0),
      (3L, ts("2026-01-01 10:00:40"), "BTC", 300.0),
      (4L, ts("2026-01-01 10:00:00"), "ETH", 50.0) // single tick: no row
    ).toDF("event_id", "ts", "event_type", "value")
    val out = Serving.twap(ev).as[(String, Double)].collect().toMap
    out.keySet shouldBe Set("BTC")
    out("BTC") shouldBe 175.0 +- 1e-9
  }

  test("maxDrawdown: deepest peak-to-trough; simultaneous ticks see each " +
      "other's peak") {
    val ev = Seq(
      // path 100 -> 120 -> 90 -> 110 -> 60: worst = 60/120 - 1 = -0.5
      (1L, ts("2026-01-01 10:00:00"), "BTC", 100.0),
      (2L, ts("2026-01-01 10:01:00"), "BTC", 120.0),
      (3L, ts("2026-01-01 10:02:00"), "BTC", 90.0),
      (4L, ts("2026-01-01 10:03:00"), "BTC", 110.0),
      (5L, ts("2026-01-01 10:04:00"), "BTC", 60.0),
      // ETH: tie at t0 (50 and 100 simultaneous) then 80: the RANGE
      // peak makes the tie rows see 100, so dd = min(50/100, 80/100)-1
      (6L, ts("2026-01-01 10:00:00"), "ETH", 50.0),
      (7L, ts("2026-01-01 10:00:00"), "ETH", 100.0),
      (8L, ts("2026-01-01 10:01:00"), "ETH", 80.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = Serving.maxDrawdown(ev).as[(String, Double)].collect().toMap
    out("BTC") shouldBe -0.5 +- 1e-9
    out("ETH") shouldBe -0.5 +- 1e-9
  }

  test("funnel: strict stage ordering — out-of-order and same-timestamp " +
      "completions do not convert") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "view", ts("2026-01-01 10:00:00")),
      (1L, "click", ts("2026-01-01 10:01:00")),
      (1L, "purchase", ts("2026-01-01 10:02:00")),
      // u2: clicked BEFORE viewing — stage 2 not completed
      (2L, "click", ts("2026-01-01 09:00:00")),
      (2L, "view", ts("2026-01-01 10:00:00")),
      (2L, "purchase", ts("2026-01-01 11:00:00")),
      // u3: click at the SAME instant as view — strict > rejects it
      (3L, "view", ts("2026-01-01 10:00:00")),
      (3L, "click", ts("2026-01-01 10:00:00")),
      // u4: view only
      (4L, "view", ts("2026-01-01 10:00:00")),
      // u5: no view at all — never enters the funnel
      (5L, "purchase", ts("2026-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Serving.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx").as[(Int, String, Long)].collect()
    out shouldBe Array(
      (1, "view", 4L),       // u1-u4
      (2, "click", 1L),      // only u1's ordered click
      (3, "purchase", 1L))   // only u1
    // a later re-view does not resurrect u2's click (threshold is the
    // EARLIEST view)
    val ev2 = ev.union(Seq((2L, "click", ts("2026-01-01 10:30:00")))
      .toDF("user_id", "event_type", "ts"))
    Serving.funnel(ev2, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .filter(col("stage_idx") === 2).select("n_users").as[Long]
      .head() shouldBe 2L    // the post-view click converts
  }
}
