package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.GraftBridge

/** Native Catalyst expression for the Morton (z-curve) value: interleave
  * the low `bits` bits of each LongType child into one BIGINT — bit `i`
  * of child `j` lands at position `i * children.size + j`, matching
  * [[graft.sources.Layout.zValueHof]] bit-for-bit (asserted in
  * LayoutSpec, which keeps the q79 oracle contract intact).
  *
  * The HOF form folds a per-row `sequence(0, bits-1)` with two
  * `call_function` shifts per bit per column (~µs/row); this is one
  * fused loop per child inside whole-stage codegen. Layout control over
  * a 100 TB write touches every row, so the projection constant matters.
  */
case class ZValue(children: Seq[Expression], bits: Int) extends Expression {

  require(children.nonEmpty && children.size * bits <= 63,
    s"${children.size} cols x $bits bits exceeds BIGINT")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "z_value"

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      z |= ZValue.spread(v.asInstanceOf[Long], bits, n, j)
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code).reduce(_ + _)
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val spreads = evals.zipWithIndex.map { case (e, j) =>
      s"graft.functions.ZValue.spread(${e.value}, $bits, $n, $j)"
    }.mkString(" | ")
    ev.copy(code =
      code"""
            |$childCode
            |boolean ${ev.isNull} = $anyNull;
            |long ${ev.value} = ${ev.isNull} ? -1L : ($spreads);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZValue {

  /** Low `bits` bits of `v` spread to positions `i * n + j` — the same
    * arithmetic-shift-and-mask the HOF form applies per bit. */
  def spread(v: Long, bits: Int, n: Int, j: Int): Long = {
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((v >> i) & 1L) << (i * n + j)
      i += 1
    }
    r
  }

  /** Column DSL form; children are cast to long like the HOF form. */
  def zValue(cols: Seq[Column], bits: Int): Column =
    GraftBridge.column(ZValue(
      cols.map(c => GraftBridge.expression(c.cast("long"))), bits))
}
