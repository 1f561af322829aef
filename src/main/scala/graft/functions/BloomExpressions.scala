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
