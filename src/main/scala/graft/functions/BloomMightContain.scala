package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] over long keys.
  *
  * This is the executor side of [[graft.ops.Joins.bloomPrefilteredJoin]]:
  * the filter object rides into generated code as a plan reference object
  * (same mechanism Spark's own `InjectRuntimeFilter` uses), so probing is
  * one virtual call per row inside whole-stage codegen — no UDF
  * serialization boundary, no Row boxing.
  *
  * May return true for absent keys (that's a Bloom filter); never false
  * for present ones. Callers must re-verify with the real join — the
  * point is only to drop most non-matching rows BEFORE their shuffle.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
