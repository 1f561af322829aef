package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle hashes of a text column, in one pass:
  * split on single spaces, xxhash64 each n-gram of consecutive tokens,
  * de-duplicate. Returns `array<long>` sorted ascending — the sort
  * gives every document the same global total order over shingles,
  * which is what makes prefix filtering ([[Dedup.ngramJaccard]]) exact
  * and lets [[SortedIntersectSize]] count overlaps with a linear merge.
  *
  * Equivalent to
  * `array_distinct(transform(<n-gram shingles>, s => xxhash64(s)))`
  * built from `split`/`sequence`/`element_at`/`concat_ws`, but that
  * formulation interprets a lambda per shingle and — because common
  * subexpressions are not eliminated inside lambda bodies — re-splits
  * the full text for every element access, turning an O(tokens) scan
  * into O(tokens²) allocation churn. Near-dup pipelines evaluate this
  * on every document on both sides of a self-join, so the single-pass
  * rewrite is the difference between the shingle stage being free and
  * being the bottleneck.
  *
  * Hash identity: xxhash64(seed 42) over the UTF-8 bytes of the
  * space-joined n-gram — byte-identical to the built-in
  * `xxhash64(concat_ws(" ", tok_i, ..., tok_{i+n-1}))`.
  *
  * CodegenFallback is deliberate: the expression runs once per
  * document row (not per pair, not per element), so the virtual-call
  * overhead is noise while eval keeps the loop in plain JVM code that
  * JIT compiles tightly.
  */
case class ShingleHashes(child: Expression, n: Int, seed: Long = 42L)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      seen.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
