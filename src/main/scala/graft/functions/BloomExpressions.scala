package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Ships a serialized Bloom filter to executors and deserializes it
  * ONCE per executor JVM (transient lazy), not per row or per task
  * closure — the same pattern Spark's own runtime-filter expression
  * uses.
  */
class BloomHolder(val bytes: Array[Byte]) extends Serializable {
  @transient lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}

/** `bloom.mightContainLong(key)` as a native codegen'd predicate — the
  * executor side of semi-join reduction (see
  * [[graft.operators.Relational.bloomPrefilterJoin]]).
  *
  * ONE-SIDED error contract: `false` means the key is definitely not
  * in the built set (safe to drop before the shuffle); `true` may be a
  * false positive (rate `fpp`), which the exact join downstream
  * removes. Accepts integral keys; they are widened to long exactly as
  * `DataFrameStatFunctions.bloomFilter` widens them when building, so
  * membership tests see the same 64-bit value the build inserted.
  */
case class BloomMightContainLong(child: Expression, holder: BloomHolder)
  extends UnaryExpression with Predicate {

  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    holder.bloom.mightContainLong(v.asInstanceOf[Number].longValue())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftBloom", holder,
        classOf[BloomHolder].getName)
      s"${ev.value} = $ref.bloom().mightContainLong((long) $c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** `∃ element of the array: bloom.mightContainLong(element)` as one
  * codegen'd predicate with FIRST-HIT EARLY EXIT — the map-only corpus
  * side of Bloom-prefiltered decontamination
  * ([[graft.operators.Curation.decontaminateByBloom]]). Compared to
  * `explode(shingles)` + per-element probe + `distinct` on doc ids,
  * this never leaves the scan: no row multiplication, no shuffle, and
  * a contaminated doc stops probing at its first shared shingle.
  *
  * Same one-sided contract as [[BloomMightContainLong]], lifted to the
  * array: `false` means NO element is in the built set (the doc cannot
  * share a shingle, so containment is 0 and it is safe to bypass the
  * verification join); `true` may be a false positive, which the exact
  * containment verify downstream removes. Null elements are skipped;
  * a null array yields null.
  */
case class BloomMightContainAnyLong(child: Expression, holder: BloomHolder)
  extends UnaryExpression with Predicate {

  override def prettyName: String = "graft_bloom_might_contain_any"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = holder.bloom
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) && b.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftBloom", holder,
        classOf[BloomHolder].getName)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = false;
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i) && $ref.bloom().mightContainLong($c.getLong($i))) {
         |    ${ev.value} = true;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainAnyLong =
    copy(child = newChild)
}
