package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram Jaccard, MinHash+LSH, and SimHash near-dup detection over
  * the `documents` table.
  *
  * Scale design (100 TB):
  *  - Exact dedup is one hash-shuffle on the content hash — the
  *    theoretical minimum.
  *  - Pairwise similarity is NEVER all-pairs: candidates come from an
  *    inverted shingle index (small corpora) or MinHash band buckets
  *    (the scale path); exact Jaccard runs only on candidates.
  *  - All hashes are xxhash64 (codegen'd Catalyst expression), seeded
  *    deterministically — results are partitioning-independent.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct text, the surviving
    * doc_id (min), and the duplicate count. Single shuffle on md5(text)
    * — never on the full text bytes.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup keeping whole surviving rows (deterministic: min
    * doc_id wins, unlike dropDuplicates which keeps an arbitrary row).
    */
  def exactRows(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    docs.withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
      .drop("keep_id")
  }

  /** Word n-gram shingles of the canonical token stream, distinct. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    if (n <= 1) array_distinct(toks)
    else {
      val idx = sequence(lit(0), size(toks) - n)
      // guard: size < n would make sequence() count DOWN and index 0
      val grams = array_distinct(transform(idx, i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, (i + j + 1).cast("int"))): _*)))
      when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
    }
  }

  /** Exact n-gram Jaccard similarity for every candidate pair, via an
    * inverted shingle index (explode → self-equi-join on shingle →
    * count). Pairs sharing zero shingles never materialize. Output:
    * (doc_a, doc_b, jaccard) for jaccard ≥ threshold, doc_a < doc_b.
    *
    * `maxShingleDf` drops shingles appearing in more than that many
    * docs from *candidate generation only* (classic stop-shingle
    * cut — they generate O(df²) pairs and no near-dup signal); the
    * Jaccard itself stays exact because sizes and intersections are
    * computed over the full shingle sets when `maxShingleDf = 0`
    * (disabled) or the dropped shingles are counted back via the
    * full per-doc sizes. With the cut enabled the intersection count
    * is a lower bound, so recall can drop for pairs whose overlap is
    * exclusively stop-shingles — acceptable by construction.
    */
  def ngramJaccard(docs: DataFrame, n: Int, threshold: Double,
                   maxShingleDf: Int = 0): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val candidates0 =
      if (maxShingleDf <= 0) sh
      else {
        val w = Window.partitionBy(col("sh"))
        sh.withColumn("df", count(lit(1)).over(w)).filter(col("df") <= maxShingleDf).drop("df")
      }
    val a = candidates0.as("a")
    val b = candidates0.as("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signatures: for each doc, `numHashes` minima of seeded
    * xxhash64 over its shingle set. One explode + one grouped agg;
    * signature is deterministic and partitioning-independent.
    */
  def minhashSignatures(docs: DataFrame, n: Int, numHashes: Int): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
    val mins = (0 until numHashes).map(i => min(xxhash64(lit(i), col("sh"))).as(s"mh_$i"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding near-dup pairs — the 100 TB-scale path.
    * Bands the signature into `bands` groups of `numHashes/bands` rows,
    * hashes each band, and joins docs sharing any band bucket; then
    * verifies candidates with exact n-gram Jaccard.
    *
    * Cost model: candidate generation is a shuffle on (band, bucket) —
    * collision probability for docs with Jaccard s is 1-(1-s^r)^b, so
    * true near-dups are found w.h.p. while the quadratic all-pairs
    * blowup never happens.
    */
  def minhashLsh(docs: DataFrame, n: Int = 2, threshold: Double = 0.5,
                 numHashes: Int = 32, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minhashSignatures(docs, n, numHashes)
    val bandCols = (0 until bands).map { bId =>
      struct(lit(bId).as("band"),
        xxhash64((bId * r until (bId + 1) * r).map(i => col(s"mh_$i")): _*).as("bucket"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard over full shingle sets
    val sh = docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("sh"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over the token stream: per bit, sum +1/-1 votes of
    * each token's xxhash64 bit, sign → bit. One explode + one agg.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v_$b")
    }
    val votes = toks.groupBy("doc_id").agg(bitVotes.head, bitVotes.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"v_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    votes.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found via
    * band blocking over `maxDist + 1` disjoint bit ranges (pigeonhole:
    * ≤ maxDist differing bits cannot touch all maxDist+1 bands, so any
    * qualifying pair shares at least one exact band).
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, "maxDist must be in [0, 63]")
    val nBands = maxDist + 1
    val sig = simhash(docs)
    val bandCols = (0 until nBands).map { bId =>
      val lo = bId * 64 / nBands
      val hi = (bId + 1) * 64 / nBands // exclusive
      val width = hi - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(bId).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(mask).as("bucket"))
    }
    val buckets = sig.select(col("doc_id"), col("simhash"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val hamming = {
      val x = col("a.simhash").bitwiseXOR(col("b.simhash"))
      bit_count(x)
    }
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
