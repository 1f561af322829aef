package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token statistics of a space-separated text column:
  * `struct<n_tokens, n_distinct_tokens, sum_token_len>`. Replaces a
  * `split` + `size` + `array_distinct` + `aggregate(...)` pipeline that
  * re-splits the text for every lambda element access (the same
  * interpreted-lambda trap [[ShingleHashes]] exists for — see there);
  * here the text is split once and all three statistics fall out of a
  * single loop. Distinctness is tracked by xxhash64 of the token
  * (collision odds ~2⁻⁶⁴, same contract as the dedup operators).
  *
  * CodegenFallback: runs once per document row; the loop body JIT
  * compiles, expression-dispatch overhead is per-row noise.
  */
case class TokenStats(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_tokens", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false)))

  override def prettyName: String = "graft_token_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val seen = new java.util.HashSet[java.lang.Long]()
    var sumLen = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      sumLen += t.length
      val u = UTF8String.fromString(t)
      seen.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
      i += 1
    }
    InternalRow(toks.length.toLong, seen.size.toLong, sumLen)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

/** One-pass 64-bit SimHash of the token stream: per token, xxhash64;
  * per bit, ±1 votes weighted by term occurrence; sign → bit. Replaces
  * the explode → 64 conditional-sum aggregates → bit-reassembly plan
  * (which shuffles every token of the corpus) with a single map-only
  * projection — at 100 TB the difference between a full-corpus shuffle
  * and none. Bit-compatible with the aggregation formulation: votes
  * count token OCCURRENCES (classic frequency-weighted SimHash).
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val u = UTF8String.fromString(toks(i))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
