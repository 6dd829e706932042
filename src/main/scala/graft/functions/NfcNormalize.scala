package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Canonical composition is the first step of any text-dedup pipeline
  * that sees real-world crawls: the same visible string arrives both
  * precomposed (é = U+00E9) and decomposed (e + U+0301), and without
  * normalization exact dedup, shingling, and fingerprinting all treat
  * them as different documents. Spark ships no normalizer built-in;
  * this wraps `java.text.Normalizer` (ICU-equivalent for NFC) in the
  * same single-virtual-call codegen shape as [[CosineSimilarity]].
  * DuckDB's `nfc_normalize` implements the same Unicode algorithm, so
  * the result is oracle-checkable byte-for-byte (q128).
  *
  * NFC is idempotent (tested) and preserves compatibility characters
  * (ligatures, full-width forms) — use NFKC upstream if those must
  * fold, at the cost of no DuckDB twin.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Column DSL form. */
  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
