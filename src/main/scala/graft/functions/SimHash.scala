package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text's whitespace tokens as one native loop.
  *
  * Bit-for-bit identical to the declarative form it replaces
  * (`aggregate(zip_with(...))` over `transform(split(lower(trim(s)),
  * "\s+"), xxhash64)`): tokens come from the same UTF8String `trim` +
  * `toLowerCase` + regex split (limit −1, as Spark's `split` uses), each
  * token is hashed with the same XXH64 (seed 42) Spark's `xxhash64`
  * applies to string bytes, and bit b of the result is set iff more than
  * half the token hashes have bit b set. The HOF form interpreted a
  * 64-wide lambda per token (~100 allocations/token); this is one
  * arithmetic loop per row inside whole-stage codegen.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  def compute(input: UTF8String): Long = {
    val toks = input.trim().toLowerCase().toString.split("\\s+", -1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val u = UTF8String.fromString(toks(i))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    val n = toks.length
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) sim |= 1L << b
      b += 1
    }
    sim
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHash", this, classOf[SimHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHash {
  def simhash(text: Column): Column =
    GraftBridge.column(SimHashExpr(GraftBridge.expression(text)))
}
