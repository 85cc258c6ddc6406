package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string's code points as one native loop:
  * `acc = (acc·131 + codepoint) mod (1e9+7)`, empty → 0.
  *
  * Replaces the `aggregate(split(s, ""), ...)` fold in the fingerprint hot
  * path: the HOF form first materializes a per-character string array and
  * then runs an interpreted lambda per element (~two allocations + dynamic
  * dispatch per character); this is a single arithmetic loop per row inside
  * whole-stage codegen. The fold itself is engine-portable — the DuckDB
  * oracle expresses the identical recurrence with list_transform +
  * list_reduce, so results stay hash-comparable.
  *
  * Normalization (trim/lower/whitespace-collapse) stays OUTSIDE in
  * ordinary Catalyst expressions: those are already codegen'd, and keeping
  * them shared guarantees the native and HOF forms see identical input.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  def compute(input: UTF8String): Long = {
    val s = input.toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rollingHash", this,
      classOf[RollingHashExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHash {
  def rollingHash(s: Column): Column =
    GraftBridge.column(RollingHashExpr(GraftBridge.expression(s)))
}
