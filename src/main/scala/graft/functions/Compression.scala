package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a document's UTF-8 bytes — the
  * low-entropy quality signal the large-corpus recipes gate on (RefinedWeb
  * / MassiveText-style: machine-generated boilerplate and keyword-stuffed
  * spam compress far better than natural prose, so a LOW ratio is a drop
  * signal complementary to the n-gram repetition ratio, which only sees
  * exact token repeats). Runs as a native codegen'd expression: raw-level
  * DEFLATE (nowrap — no zlib header, so tiny docs aren't dominated by
  * framing), one thread-local `Deflater` reset per row rather than one
  * native allocation per row. Narrow, shuffle-free, composes into the
  * [[graft.operators.CorpusFilter]] gate chain like any other column.
  *
  * Determinism: DEFLATE output for a fixed level is a pure function of
  * the input bytes for a given zlib build; the JDK bundles zlib, so
  * results are stable within a JVM release line — the operator is priced
  * rows-only + spec, never by a cross-engine hash oracle.
  */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType

  // one Deflater per executor thread, reset per row — Deflater holds
  // native zlib state and per-row construction is measurable churn
  @transient private lazy val local =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6, true)
    }

  def compute(input: UTF8String): Double = {
    val bytes = input.getBytes
    if (bytes.length == 0) return 1.0 // empty: incompressible by convention
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("deflateRatio", this,
      classOf[DeflateRatioExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DeflateRatioExpr = copy(child = newChild)
}

object Compression {
  /** Compressed-size / raw-size of the UTF-8 bytes of `text` in (0, ~1.1];
    * lower = more redundant. See [[DeflateRatioExpr]] for the contract.
    */
  def compressionRatio(text: Column): Column =
    GraftBridge.column(DeflateRatioExpr(GraftBridge.expression(text)))
}
