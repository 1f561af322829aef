package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Fixture payloads follow FIXTURES.md §1 (raw Coinbase ticker shape,
  * reference `process_silver.py:35-43` parse target).
  */
class SilverSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private val good =
    """{"type":"ticker","product_id":"BTC-USD","price":"88383.19","volume_24h":"1025003.26",
      |"time":"2025-12-31T20:01:28.601631Z","trade_id":"309141779","side":"sell","last_size":"0.31249536"}"""
      .stripMargin.replace("\n", "")
  private val batchType = good.replace("\"type\":\"ticker\"", "\"type\":\"ticker_batch\"")
  private val wrongType = good.replace("\"type\":\"ticker\"", "\"type\":\"subscriptions\"")
  private val nullProduct = good.replace("\"product_id\":\"BTC-USD\",", "")
  private val malformed = """{"type":"ticker","product_id":"""

  private def bronze(payloads: String*) =
    payloads.toSeq.toDF("json_payload")

  test("parseTickers keeps ticker and ticker_batch, drops the rest") {
    val out = Silver.parseTickers(bronze(good, batchType, wrongType, nullProduct, malformed))
    out.count() shouldBe 2
    out.select("symbol").distinct().as[String].collect() shouldBe Array("BTC-USD")
  }

  test("parseTickers types: decimal(18,8) price, parsed ISO-8601 micros timestamp") {
    val out = Silver.parseTickers(bronze(good))
    val row = out.select("price", "trade_timestamp", "trade_id", "taker_side").head()
    row.getDecimal(0) shouldBe new java.math.BigDecimal("88383.19000000")
    row.getTimestamp(1).toInstant.toString shouldBe "2025-12-31T20:01:28.601631Z"
    row.getLong(2) shouldBe 309141779L
    row.getString(3) shouldBe "sell"
    out.schema("price").dataType.simpleString shouldBe "decimal(18,8)"
  }

  test("malformed JSON yields null struct (PERMISSIVE), filtered out") {
    val out = Silver.parseTickers(bronze(malformed))
    out.count() shouldBe 0
  }

  test("dedupTrades removes exact identity duplicates") {
    val out = Silver.dedupTrades(
      Silver.parseTickers(bronze(good, good, batchType)))
    out.count() shouldBe 1
  }
}
