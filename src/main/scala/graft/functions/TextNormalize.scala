package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen expression —
  * the first step of corpus text normalization (decomposed "e" + U+0301
  * and precomposed "é" must dedup/fingerprint/shingle identically, or
  * every downstream equality is silently wrong on real web text).
  *
  * Spark has no normalization built-in, so this wraps
  * `java.text.Normalizer` (pure JDK, same Unicode tables everywhere on a
  * cluster) behind `doGenCode`: already-normalized strings — the vast
  * majority of real text — are detected with the quick-check
  * (`isNormalized`) and returned as the ORIGINAL UTF8String, no allocation;
  * only denormalized rows pay the String round-trip. Stays inside
  * whole-stage codegen either way.
  *
  * Case folding / whitespace collapse stay OUTSIDE in built-in expressions
  * ([[TextNormalize.normalized]] composes them) — same division of labor as
  * [[RollingHashExpr]]: native code only where Catalyst has no vocabulary.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nfcNormalize", this,
      classOf[NfcNormalizeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object TextNormalize {

  /** Unicode NFC canonical composition. */
  def nfc(s: Column): Column =
    GraftBridge.column(NfcNormalizeExpr(GraftBridge.expression(s)))

  /** The standard corpus normalization pass: NFC → lowercase → collapse
    * whitespace runs to single spaces → trim. One narrow codegen'd
    * pipeline per row; engine-portable (DuckDB spells it
    * `trim(regexp_replace(lower(nfc_normalize(s)), '\s+', ' ', 'g'))`).
    */
  def normalized(s: Column): Column =
    trim(regexp_replace(lower(nfc(s)), "\\s+", " "))
}
