package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels. The expression-tree formulation of PQ
  * encoding is `least()` over m × k struct expressions (512 at the
  * defaults) — the generated code compiles for seconds and the
  * codebook literals bloat every task binary. These kernels carry the
  * codebooks as plain JVM arrays inside the expression and sweep them
  * in one tight loop per row. CodegenFallback is deliberate: each runs
  * once per row (never inside a pair join), so the virtual-call
  * overhead is noise while the loop body JITs hot — the same trade as
  * [[ShingleHashes]].
  *
  * With `normalize = true` (the flat/raw-vector layout) both kernels
  * L2-normalize implicitly (divide by the row norm) so squared-L2
  * ranking is monotone in cosine; a zero vector falls back to norm 1
  * instead of dividing by zero. With `normalize = false` the input is
  * taken as-is — the residual-coding layout, where the caller already
  * subtracted the cell centroid from the unit vector and a second
  * normalization would distort the residual space.
  */
private[graft] trait PqKernel extends UnaryExpression with CodegenFallback {
  def books: Seq[Seq[Seq[Double]]]
  def normalize: Boolean

  @transient protected lazy val m: Int = books.length
  @transient protected lazy val k: Int = books.head.length
  @transient protected lazy val sub: Int = books.head.head.length
  // flat(s)(c) = centroid component array; cNorm2(s)(c) = |c|²
  @transient protected lazy val flat: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient protected lazy val cNorm2: Array[Array[Double]] =
    flat.map(_.map(c => c.map(x => x * x).sum))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }

  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def elem(x: ArrayData, i: Int): Double =
    if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)

  protected def rowNorm(x: ArrayData): Double = {
    if (!normalize) return 1.0
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = elem(x, i); acc += v * v; i += 1 }
    val nrm = math.sqrt(acc)
    if (nrm == 0.0) 1.0 else nrm
  }

  protected def subDot(x: ArrayData, s: Int, c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val off = s * sub
    while (i < sub) { acc += elem(x, off + i) * c(i); i += 1 }
    acc
  }
}

/** `(vec_id, codes)` encoding kernel: code s = argmin-L2 centroid of
  * the normalized s-th subvector, computed as argmin of
  * `|c|²/2 − dot(sub, c)/|x|`; ties break to the lowest code.
  */
case class PqEncodeCodes(child: Expression, books: Seq[Seq[Seq[Double]]],
                         normalize: Boolean = true)
  extends PqKernel {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val nrm = rowNorm(x)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val d = cNorm2(s)(c) / 2.0 - subDot(x, s, flat(s)(c)) / nrm
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** Per-query ADC distance tables: table(s)(c) = squared L2 distance
  * from the normalized s-th query subvector to centroid c. One kernel
  * call replaces m × k dot-product expressions on the broadcast side.
  */
case class PqDistTables(child: Expression, books: Seq[Seq[Seq[Double]]],
                        normalize: Boolean = true)
  extends PqKernel {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_tables"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val nrm = rowNorm(x)
    val tables = new Array[AnyRef](m)
    var s = 0
    while (s < m) {
      // |q_s|² of the normalized subvector
      var q2 = 0.0
      var i = 0
      val off = s * sub
      while (i < sub) { val v = elem(x, off + i) / nrm; q2 += v * v; i += 1 }
      val row = new Array[Double](k)
      var c = 0
      while (c < k) {
        row(c) = q2 - 2.0 * subDot(x, s, flat(s)(c)) / nrm + cNorm2(s)(c)
        c += 1
      }
      tables(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(tables)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTables =
    copy(child = newChild)
}
