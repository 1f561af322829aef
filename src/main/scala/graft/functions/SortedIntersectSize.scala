package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection cardinality of two ascending-sorted `array<long>`
  * columns via a linear two-pointer merge — O(|A|+|B|) with zero
  * allocation, versus `size(array_intersect(...))` which builds a hash
  * set per row. This is the per-candidate verification kernel of the
  * near-dup joins: it runs once per candidate pair, so the merge loop —
  * not expression dispatch — dominates, and CodegenFallback keeps the
  * implementation a plain JIT-compiled JVM loop.
  *
  * Inputs MUST be sorted ascending with distinct elements (as produced
  * by [[ShingleHashes]]); duplicates would be counted once per matching
  * advance and unsorted input silently undercounts.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    cnt
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** [[SortedIntersectSize]] with an EARLY-EXIT lower bound: returns the
  * exact intersection cardinality when it can still reach `minInter`
  * (a per-row long column), and -1 the moment it provably cannot —
  * `count + min(remaining_a, remaining_b) < minInter` prunes the rest
  * of the merge. This is the candidate-verification kernel's fast
  * reject: the pair miners verify millions of candidates of which a
  * few hundred qualify, and a non-qualifying balanced pair exits after
  * ~(1−t/(1+t))·|d| steps instead of walking both arrays to the end.
  * Callers must treat -1 as "below minInter" and keep their EXACT
  * threshold filter on the surviving rows — the bound only skips work
  * for rows the filter was going to drop anyway.
  */
case class SortedIntersectAtLeast(left: Expression, right: Expression,
                                  min: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with CodegenFallback {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = min
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_at_least"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (arrOk && min.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, bigint), " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}, ${min.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val need = m.asInstanceOf[Long]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < nx && j < ny) {
      if (cnt + math.min(nx - i, ny - j) < need) return -1L
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { cnt += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    if (cnt < need) -1L else cnt
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedIntersectAtLeast =
    copy(left = newFirst, right = newSecond, min = newThird)
}
