package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental distinct-count store on HyperLogLog sketches — the
  * "distinct users per segment, updated daily" loop a lakehouse serves
  * without ever re-reading history.
  *
  * `COUNT(DISTINCT x)` is the one common aggregate that is NOT
  * additive: yesterday's count plus today's count double-counts
  * returning users, so the naive daily job re-scans the whole corpus.
  * At 100 TB that re-scan is the pipeline's largest recurring cost.
  * HLL sketches restore additivity: a sketch is a tiny (≈ 2^lgK bytes)
  * mergeable summary, union is associative/commutative/idempotent, and
  * the union's estimate equals the estimate over the concatenated
  * input. The daily job therefore sketches ONLY its shard
  * (map-side-combined groupBy, rows = |keys|) and appends; the reader
  * unions per key — work proportional to (shards × keys), independent
  * of corpus size. Same trick Spark itself exposes as
  * `approx_count_distinct`, but with the SKETCH persisted so increments
  * compose across jobs — the Datasketches HLL build/union functions
  * (`hll_sketch_agg` / `hll_union_agg`) are codegen'd built-ins, no
  * UDF anywhere.
  *
  * Store layout mirrors the unigram vocab store
  * ([[TextOps.extendVocab]]): `data/` parquet rows
  * `(key..., hll binary)`, one row per (shard × key); commits ride
  * [[graft.util.Manifest]] generations (atomic visibility, crash-safe
  * retries, re-delivered extends are no-ops, time travel). Reference analogy: the dashboard's per-symbol distinct
  * counts (`dashboard/app.py` aggregations) recomputed per page load —
  * here they are served from sketches.
  */
object Hll {

  private def dataPath(path: String) = s"$path/data"

  /** One sketch row per key: `(keyCols..., hll)`. The groupBy is
    * map-side combined — executors merge sketches locally, the
    * exchange carries |keys| sketches per partition, not rows.
    */
  def keySketches(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Initialize the store from a first corpus tranche. */
  def buildDistinctStore(df: DataFrame, keyCols: Seq[String], valueCol: String,
                         path: String, lgK: Int = 12): Unit =
    graft.util.Manifest.init(df.sparkSession, path) {
      keySketches(df, keyCols, valueCol, lgK)
        .write.mode(SaveMode.Overwrite).parquet(dataPath(path))
    }

  /** Fold a shard in: append the SHARD'S sketches (nothing existing is
    * rewritten). `shardId` dedups re-delivery via the ledger — a
    * doubled shard would not change the UNION (idempotent), but it
    * would double the store's row count and the read-side merge work,
    * so the ledger keeps extends exactly-once like every other index.
    */
  def extendDistinctStore(shard: DataFrame, keyCols: Seq[String],
                          valueCol: String, path: String,
                          shardId: Option[String] = None,
                          lgK: Int = 12): Unit = {
    graft.util.Manifest.extend(shard.sparkSession, path, shardId) {
      keySketches(shard, keyCols, valueCol, lgK)
        .write.mode(SaveMode.Append).parquet(dataPath(path))
    }
    ()
  }

  /** Serve per-key distinct estimates from the store: union the
    * sketches per key (shards × keys rows in, |keys| out), estimate.
    * Never touches the corpus.
    */
  def distinctCounts(spark: SparkSession, path: String,
                     keyCols: Seq[String],
                     asOf: Option[Int] = None): DataFrame =
    graft.util.Manifest.read(spark, path, "data", asOf)
      .groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("n_distinct"))

  /** One-shot estimate over `df` directly — the reference the store
    * must track. NOT bit-identical in general: a stream-built
    * DataSketches HLL serves the HIP estimator while a union result
    * can only serve the composite one, so store == one-shot exactly
    * in the coupon-exact regime (small per-key cardinalities) and
    * within the lgK error envelope once sketches go dense (measured
    * r13 at 1,500 distincts/key, lgK=12). The UNION itself is
    * order-insensitive — shard order can never change the store's
    * registers, only the estimator mode differs from the stream path.
    */
  def distinctOneShot(df: DataFrame, keyCols: Seq[String], valueCol: String,
                      lgK: Int = 12): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
        .as("n_distinct"))
}
