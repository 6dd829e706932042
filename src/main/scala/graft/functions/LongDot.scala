package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftBridge

/** Native Catalyst expression for the exact integer dot product of two
  * `array<bigint>` columns — the hot-path form of
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)`, which Spark evaluates on
  * the interpreted HigherOrderFunction path with a per-row product
  * array allocation (measured: the q174 all-pairs cut spent ~29 s at
  * sf0.1 in the HOF form; this fused codegen loop prices the same 2 M
  * pairs in low seconds — the [[CosineSimilarity]] lesson re-applied to
  * quantized integer vectors).
  *
  * Long arithmetic wraps silently on overflow, exactly like the HOF
  * form — callers bound their operands ([[graft.dedup.Dedup
  * .semanticDedupExact]] documents its 2²⁰-quantization cap).
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<bigint>; enforced by callers (ExpectsInputTypes
  // is private[sql] in Spark 4)
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  /** Column DSL form. */
  def longDot(a: Column, b: Column): Column =
    GraftBridge.column(LongDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
