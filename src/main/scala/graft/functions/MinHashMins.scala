package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Smallest and second-smallest MinHash values of a shingle-hash set
  * for `numHashes` seeded hash functions, in one pass over the array.
  *
  * Input: the sorted `array<long>` produced by [[ShingleHashes]].
  * Output: `array<struct<m1:long, m2:long>>` of length `numHashes`,
  * where `m1` is bit-identical to the classic signature row
  * `min(xxhash64(lit(i), h))` (hash function i = the built-in XxHash64
  * chain: `XXH64.hashLong(h, XXH64.hashInt(i, seed))`) and `m2` is the
  * minimum over the remaining elements (`Long.MaxValue` when the set
  * has fewer than two elements).
  *
  * The second minimum is what query-directed multi-probe LSH perturbs:
  * when two near-identical docs disagree on one signature coordinate,
  * the disagreeing doc's min comes from a private shingle, and its
  * second minimum is — with probability ≈ the Jaccard similarity — the
  * other doc's minimum. Probing the bucket with `m2` substituted for
  * `m1` therefore targets exactly the most likely near-miss bucket,
  * instead of spending more bands ([[graft.operators.Dedup.minhashLshMultiProbe]]).
  *
  * Why a native kernel: the two-smallest fold is per element × per hash
  * function; a `aggregate()` higher-order-function formulation runs
  * interpreted with an accumulator allocation per element (no codegen
  * for HOF lambdas), ~numHashes× the cost. CodegenFallback is fine
  * here for the same reason as [[ShingleHashes]]: one eval per document
  * row, with a tight JIT-compiled loop inside.
  */
case class MinHashMins(child: Expression, numHashes: Int, seed: Long = 42L)
  extends UnaryExpression with CodegenFallback {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("m1", LongType, nullable = false),
      StructField("m2", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_minhash_mins"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.sql}")
  }

  // per-function seeds: xxhash64(lit(i), h) hashes the int literal
  // first, so the chain state after it is a constant per i
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, seed))

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val m1 = Array.fill(numHashes)(Long.MaxValue)
    val m2 = Array.fill(numHashes)(Long.MaxValue)
    var e = 0
    while (e < n) {
      val h = hs.getLong(e)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, seeds(i))
        if (v < m1(i)) { m2(i) = m1(i); m1(i) = v }
        else if (v < m2(i) && v != m1(i)) { m2(i) = v }
        i += 1
      }
      e += 1
    }
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = new GenericInternalRow(Array[Any](m1(i), m2(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashMins =
    copy(child = newChild)
}
