package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays, accumulated in double, as a
  * native Catalyst expression with whole-stage codegen.
  *
  * This is the hot kernel of every similarity operator (cosine top-k,
  * pair mining, hyperplane LSH signatures): the higher-order-function
  * formulation (`aggregate(zip_with(...))`) walks a lambda interpreter
  * per element and breaks the surrounding WholeStageCodegen span, which
  * is intolerable inside an O(N²) pair join. This expression compiles
  * to a tight primitive loop inside the generated join stage.
  *
  * Semantics match the SQL `list_sum(list_transform(...))` oracle
  * formulation bit-for-bit: elements are widened to double and summed
  * sequentially in index order, so results are independent of
  * partitioning and identical across engines.
  *
  * Mixed element types are allowed (e.g. a float embedding against a
  * literal double hyperplane). Null elements contribute 0. If the
  * arrays differ in length the common prefix is used.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case other           => other // rejected by checkInputDataTypes
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def getter(t: DataType): String =
    if (t == FloatType) "getFloat" else "getDouble"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i))
            acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
          i += 1
        }
      case (FloatType, DoubleType) =>
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i))
            acc += x.getFloat(i).toDouble * y.getDouble(i)
          i += 1
        }
      case (DoubleType, FloatType) =>
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i))
            acc += x.getDouble(i) * y.getFloat(i).toDouble
          i += 1
        }
      case _ =>
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i))
            acc += x.getDouble(i) * y.getDouble(i)
          i += 1
        }
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val ga = getter(elemType(left))
      val gb = getter(elemType(right))
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.$ga($i) * (double) $b.$gb($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
