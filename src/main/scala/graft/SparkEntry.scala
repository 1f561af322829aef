package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.util.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator capability from SURVEY.md §2
  * (or a declared extension), runnable as a batch query over the
  * driver-pinned tables at `sfDir`. `oracleSql` holds the DuckDB-
  * equivalent ANSI SQL; column names/aliases match the Spark output
  * exactly (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Candles.ohlcv(Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── gold layer: flagship candle aggregation (SURVEY §2.4 A1-A7, §7.5)
    "gold_candles_1m" -> ((s, dir) => Candles.ohlcv(Tables.events(s, dir))),
    "gold_vwap_true" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      // volume stand-in: the JSON props field k (0..99), parsed from the raw payload
      val ev = Tables.events(s, dir)
        .withColumn("vol", get_json_object(col("props"), "$.k").cast("double"))
        .filter(col("vol") > 0)
      Candles.vwapTrue(ev, col("vol"))
    }),
    // ── relational coverage (SURVEY §2.7 gap-closure + batch layer)
    "q1_pricing_summary" -> ((s, dir) => Relational.pricingSummary(s, dir)),
    "q3_shipping_priority" -> ((s, dir) => Relational.shippingPriority(s, dir)),
    "q5_local_supplier" -> ((s, dir) => Relational.localSupplierVolume(s, dir)),
    "q_orders_per_segment" -> ((s, dir) => Relational.ordersPerSegment(s, dir)),
    "q_top_suppliers" -> ((s, dir) => Relational.topSuppliers(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "gold_candles_1m" ->
      """SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS window_start,
         date_trunc('minute', CAST(ts AS TIMESTAMP)) + INTERVAL 1 MINUTE AS window_end,
         event_type AS symbol,
         arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
         arg_max(value, ts) AS close, count(*) AS trade_count,
         round(avg(value), 6) AS vwap
         FROM events GROUP BY 1, 2, 3""",
    "gold_vwap_true" ->
      """WITH ev AS (
           SELECT *, CAST(json_extract_string(props, '$.k') AS DOUBLE) AS vol
           FROM events)
         SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS window_start,
         event_type AS symbol,
         round(sum(value * vol) / sum(vol), 6) AS vwap,
         round(sum(vol), 6) AS volume, count(*) AS trade_count
         FROM ev WHERE vol > 0 GROUP BY 1, 2""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem, orders, customer
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_local_supplier" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem, orders, customer, supplier, nation, region
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1994-01-01'
           AND o_orderdate < TIMESTAMP '1996-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_orders_per_segment" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total_price,
         count(DISTINCT o_custkey) AS n_customers
         FROM orders, customer WHERE o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_top_suppliers" ->
      """SELECT s_name, round(sum(l_quantity), 2) AS total_qty,
         count(*) AS n_lines
         FROM lineitem, supplier WHERE l_suppkey = s_suppkey
         GROUP BY s_name ORDER BY total_qty DESC, s_name LIMIT 25""",
  )
}
