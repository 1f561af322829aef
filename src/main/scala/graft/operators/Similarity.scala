package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, plus a
  * random-hyperplane LSH bucketed variant as the scale path, and
  * embedding-cosine near-dup pairs.
  *
  * All vector math uses higher-order built-ins (`zip_with` +
  * `aggregate`) over doubles — codegen'd, sequential (deterministic
  * ordering, bit-stable across partitionings), no UDFs.
  *
  * Scale design: brute-force is O(Q×N) with the Q side broadcast —
  * correct for small query sets over any N (it's one scan of N).
  * The LSH variant buckets both sides on sign-pattern prefixes so
  * candidate generation is a bucket equi-join: O(N) shuffle instead
  * of O(Q×N) compare, at tunable recall.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * Queries (small) are broadcast; candidates stream through one scan.
    * Deterministic: rank on rounded cosine with vec_id tiebreak.
    */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val cand = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val scored = cand.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** All embedding pairs with cosine ≥ threshold — embedding-space
    * near-dup detection. Exact (block-nested-loop over the id-ordered
    * pairs); for the at-scale path see [[lshPairs]].
    */
  def pairsAboveThreshold(embeddings: DataFrame, threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for plane p,
    * dim d: xxhash64 folded to [-1, 1]. No RNG state — the "planes"
    * are pure functions of (p, d), so signatures are reproducible
    * across runs and cluster layouts.
    */
  private def planeWeight(p: Int, d: Column): Column =
    (pmod(xxhash64(lit(p), d), lit(2000001L)).cast("double") - lit(1000000.0)) / lit(1000000.0)

  /** Sign-bit signature of `numPlanes` random hyperplanes. */
  def lshSignature(emb: Column, numPlanes: Int): Column = {
    val dims = sequence(lit(0), size(emb) - 1)
    val bits = (0 until numPlanes).map { p =>
      val dot = aggregate(dims, lit(0.0),
        (acc, d) => acc + element_at(emb, (d + 1).cast("int")).cast("double") * planeWeight(p, d))
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed near-neighbor pairs: bucket on band prefixes of the
    * hyperplane signature, candidate-join within buckets, verify with
    * exact cosine. Recall is tunable via bands (any pair agreeing on
    * one full band of sign bits becomes a candidate).
    */
  def lshPairs(embeddings: DataFrame, threshold: Double,
               numPlanes: Int = 16, bands: Int = 4): DataFrame = {
    require(numPlanes % bands == 0)
    val r = numPlanes / bands
    val sig = embeddings.select(col("vec_id"), col("embedding"),
      lshSignature(col("embedding"), numPlanes).as("sig"))
    val bandCols = (0 until bands).map { bId =>
      struct(lit(bId).as("band"),
        shiftright(col("sig"), bId * r).bitwiseAND(lit((1L << r) - 1)).as("bucket"))
    }
    val buckets = sig.select(col("vec_id"), col("embedding"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("vec_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.embedding").as("emb_a"), col("b.embedding").as("emb_b"))
      .distinct()
      .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
