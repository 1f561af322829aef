package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Relational/batch query coverage over the TPC-H-ish star schema
  * (TESTDATA.md). The reference itself has no joins (SURVEY.md §2.7) —
  * these queries exercise the join/agg/sort capability the engine must
  * have to serve the lakehouse's batch-inspection and spread-analysis
  * layer at scale.
  *
  * Scale notes (100 TB design intent):
  *  - region/nation are broadcast explicitly: genuinely bounded (25/5
  *    rows at every scale factor), so the hint is always safe and
  *    saves AQE the discovery.
  *  - customer/supplier get NO hard broadcast hint: in TPC-H they grow
  *    linearly with scale factor, so a hard hint that is convenient at
  *    sf0.1 becomes a driver OOM at 100×. The joins are planned by
  *    size — AQE turns them into BroadcastHashJoin while the dims are
  *    genuinely small and degrades gracefully to shuffle joins when
  *    they aren't (same policy as Dedup.verifyJaccard).
  *  - Fact-fact joins (orders ⋈ lineitem) shuffle on the join key once;
  *    aggregations are partial-agg'd map-side by Catalyst.
  *  - All money aggregates round to a fixed scale so results are
  *    bit-comparable across engines (oracle parity) while staying DOUBLE.
  */
object Relational {

  /** TPC-H Q1-style pricing summary over lineitem: full-scan grouped
    * aggregate, the classic map-side-combine stress test.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-style shipping priority: customer ⋈ orders ⋈ lineitem,
    * revenue per order, top 10. customer joins by size (AQE broadcast
    * while small — see header); orders⋈lineitem shuffles once on
    * orderkey.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sfDir).filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style local-supplier volume: 6-way join through the star
    * schema — nation/region broadcast (bounded), customer/supplier
    * size-planned; single shuffle for the final group-by on nation.
    */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    val reg = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q4-shaped order priority via an EXISTS **semi join**: orders
    * from one quarter having at least one line shipped more than 90
    * days after the order date. Left-semi join probes the (deduped)
    * match set once — no row multiplication, the scalable EXISTS plan.
    */
  def orderPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    // explicit 2-column projection: the semi-join probe only needs the
    // key and the date conjunct, so the shuffle carries 16 bytes/row
    // instead of whole lineitem rows (don't rely on pruning through the
    // non-equi condition)
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q13-shaped customer distribution via a **left outer join**:
    * how many customers placed 0, 1, 2, … qualifying orders. The outer
    * join keeps order-less customers (the 0 bucket) — the semantics an
    * inner join silently loses.
    */
  def customerDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 100000.0)
    cust.join(ord, col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** Customers with no large orders — an **anti join** (NOT EXISTS),
    * counted per market segment. One shuffle, no row multiplication.
    */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 400000.0)
    cust.join(ord, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Orders priced above 1.5× their market segment's average.
    *
    * The natural correlated-subquery formulation ([[aboveSegmentAverageSql]])
    * decorrelates into a join on `c_mktsegment` — a column with ~5
    * distinct values, so every fact row hashes into 5 partitions and
    * the query becomes a straggler wall at scale. This plan instead
    * computes the 5-row per-segment cutoff as its own aggregate and
    * **broadcast**-joins it back: the fact table is never shuffled on
    * the low-cardinality key, only on the (well-distributed) custkey
    * dim join, and the filter runs map-side.
    */
  def aboveSegmentAverage(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_totalprice"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
    // ~#segments rows: always broadcastable, whatever the fact size
    val cutoffs = joined.groupBy(col("c_mktsegment"))
      .agg((lit(1.5) * avg(col("o_totalprice"))).as("cutoff"))
    joined.join(broadcast(cutoffs), Seq("c_mktsegment"))
      .filter(col("o_totalprice") > col("cutoff"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
  }

  /** The same query as a **correlated scalar subquery** through the SQL
    * entry point — kept to exercise Catalyst's decorrelation (analyzer/
    * optimizer path the DataFrame-built queries never touch); the spec
    * asserts it agrees with the broadcast plan. Not the gated/benched
    * variant: decorrelation joins on the 5-value segment key (skew).
    */
  def aboveSegmentAverageSql(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("g_orders")
    Tables.customer(spark, sfDir).createOrReplaceTempView("g_customer")
    spark.sql(
      """SELECT c.c_mktsegment, count(*) AS n_orders,
         round(sum(o.o_totalprice), 2) AS total_price
         FROM g_orders o JOIN g_customer c ON o.o_custkey = c.c_custkey
         WHERE o.o_totalprice > (
           SELECT 1.5 * avg(o2.o_totalprice)
           FROM g_orders o2 JOIN g_customer c2 ON o2.o_custkey = c2.c_custkey
           WHERE c2.c_mktsegment = c.c_mktsegment)
         GROUP BY c.c_mktsegment""")
  }

  /** Multi-level totals via ROLLUP (grouping sets): per
    * (returnflag, linestatus), per returnflag, and grand total in one
    * pass — Catalyst expands the grouping sets and the whole thing
    * stays a single Expand + hash aggregate (one shuffle), not three
    * queries.
    */
  def revenueRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Exact interpolated percentiles of order value per segment, with
    * the continuous-interpolation arithmetic written out explicitly —
    * `pos = 1 + (n-1)·p`, `v = v_lo + (v_hi − v_lo)·frac` — instead of
    * calling the engine's `percentile`. Built-in implementations
    * (Spark `percentile`, DuckDB `quantile_cont`) compute the same
    * definition with differently-ordered IEEE operations, so the two
    * engines can differ in the last ulp; when the interpolated value
    * then lands exactly on a rounding boundary (seen: p50 =
    * 252666.885 at sf0.01) `round(…, 2)` diverges and the oracle hash
    * fails. Making both engines evaluate the identical expression
    * makes the doubles bit-identical; emitting integer cents
    * (`floor(v·100 + 0.5)`) removes the engine-specific decimal
    * rounding entirely.
    *
    * (The built-in `percentile` / `percentile_approx` path is still
    * covered by RelationalSpec, which asserts built-in ≈ explicit.)
    *
    * Plan shape: one broadcast dim join + one shuffle on the segment
    * key with a per-group sort — the same cost as any exact-percentile
    * computation. The 100 TB path is `percentile_approx` (one pass, no
    * sort), which is engine-specific and therefore spec-checked.
    */
  def orderValuePercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val joined = Tables.orders(spark, sfDir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("o_totalprice"))
    val ranked = joined
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("c_mktsegment"))))
    def pos(p: Double): Column = lit(1.0) + (col("n") - lit(1)) * lit(p)
    def lo(p: Double): Column = max(when(col("rn") === floor(pos(p)), col("o_totalprice")))
    def hi(p: Double): Column = max(when(col("rn") === ceil(pos(p)), col("o_totalprice")))
    def frac(p: Double): Column = max(pos(p) - floor(pos(p)))
    def cents(lo: Column, hi: Column, frac: Column): Column =
      floor((lo + (hi - lo) * frac) * lit(100.0) + lit(0.5)).cast("long")
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val aggs = ps.flatMap { case (p, nm) =>
      Seq(lo(p).as(s"lo_$nm"), hi(p).as(s"hi_$nm"), frac(p).as(s"f_$nm"))
    }
    ranked.groupBy(col("c_mktsegment"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("c_mktsegment") +: ps.map { case (_, nm) =>
        cents(col(s"lo_$nm"), col(s"hi_$nm"), col(s"f_$nm")).as(s"${nm}_cents")
      }: _*)
  }

  /** Order counts per segment pivoted wide by order year —
    * `RelationalGroupedDataset.pivot` with EXPLICIT pivot values.
    * Listing the values matters at scale: without them Spark runs an
    * extra distinct-collect job over the fact table just to discover
    * the columns, and the pivot becomes data-dependent (schema drift
    * on regrowth). With values fixed, this is one shuffle on the
    * group key; each pivot cell is a map-side-combined conditional
    * aggregate.
    */
  def segmentYearPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val years = 1995 to 2001
    Tables.orders(spark, sfDir)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), year(col("o_orderdate")).as("yr"))
      .groupBy(col("c_mktsegment"))
      .pivot("yr", years.map(Integer.valueOf))
      .agg(count(lit(1)))
      .select(col("c_mktsegment") +:
        years.map(y => coalesce(col(y.toString), lit(0L)).as(s"y$y")): _*)
  }

  /** Driver-visible self-check for the sketch-based approximate
    * aggregates — the actual 100 TB path for percentiles and distinct
    * counts (one pass, bounded memory, no per-group sort). Their raw
    * outputs are engine-specific (GK sketch / HLL++), so no external
    * engine can reproduce them; what IS checkable anywhere is the
    * accuracy contract. Emits one row of booleans asserting
    * `percentile_approx` tracks the exact percentile within 2% and
    * `approx_count_distinct` tracks the exact distinct count within
    * 5% (2.5× its configured 2% rsd) — both computed in-engine
    * against their exact counterparts.
    */
  def approxAggChecks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).agg(
      expr("percentile(o_totalprice, 0.5)").as("ep"),
      expr("percentile_approx(o_totalprice, 0.5, 1000)").as("ap"),
      countDistinct(col("o_custkey")).as("en"),
      approx_count_distinct(col("o_custkey"), rsd = 0.02).as("an"))
    .select(
      (abs(col("ap") - col("ep")) / col("ep") <= 0.02).as("p50_within_2pct"),
      (abs(col("an") - col("en")).cast("double") / col("en") <= 0.05)
        .as("nd_within_5pct"))

  /** Skew-salted equi-join: the fact side gets a deterministic salt in
    * [0, saltFactor) derived from full row content, the (smaller) right
    * side is replicated once per salt value, and the join runs on
    * (key, salt) — a hot key's rows spread across `saltFactor`
    * partitions instead of landing on one straggler task. This is the
    * manual form of what AQE skew-join does adaptively; it exists for
    * the cases AQE can't see (deliberate layout, non-AQE contexts) and
    * to make the 100 TB skew story explicit and testable. Plain inner
    * equi-join semantics, any right-side multiplicity.
    */
  def saltedJoin(fact: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    import org.apache.spark.sql.functions.{explode, sequence}
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Semi-join reduction: drop fact rows whose key CANNOT be in `dim`
    * BEFORE the join shuffle, by testing each key against a Bloom
    * filter of the dim keys. At 100 TB this is the difference between
    * shuffling the whole fact table and shuffling only the ~matching
    * fraction: the filter is ~1.2 MB per million dim keys at 3% fpp —
    * task-closure freight, not an exchange. Spark's AQE injects this
    * automatically in narrow cases
    * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); this is the
    * explicit, always-available form, with the membership test compiled
    * into the scan's WholeStageCodegen span
    * ([[graft.functions.BloomMightContainLong]]).
    *
    * Exactness: the filter's errors are one-sided (false POSITIVES
    * only), and the exact equi-join downstream removes them — the
    * result is bit-identical to the unfiltered join for any fpp. The
    * dim side pays one distinct-count + one filter-build aggregation
    * (both dim-sized, the side that fits by assumption).
    */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame,
                         factKey: String, dimKey: String,
                         fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val nKeys = math.max(dim.select(dimKey).distinct().count(), 1L)
    val bloom = dim.stat.bloomFilter(dimKey, nKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val holder = new graft.functions.BloomHolder(bos.toByteArray)
    val pre = fact.filter(ColumnBridge.column(
      graft.functions.BloomMightContainLong(
        ColumnBridge.expression(col(factKey)), holder)))
    pre.join(dim, col(factKey) === col(dimKey))
  }

  /** Orders per market segment — size-planned dim join + two-level agg. */
  def ordersPerSegment(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  /** Top suppliers by shipped quantity — agg-then-join (the join input
    * is one row per supplier, not per lineitem), size-planned dim join,
    * deterministic top-k.
    */
  def topSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    li.groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"),
        count(lit(1)).as("n_lines"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("total_qty"), col("n_lines"))
      .orderBy(col("total_qty").desc, col("s_name"))
      .limit(25)
  }
}
