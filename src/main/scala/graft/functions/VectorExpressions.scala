package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding dot product.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * interpreted per element — lambda dispatch plus boxing per component.
  * This expression participates in whole-stage codegen: the generated Java
  * is a primitive `for` loop over `ArrayData.getDouble`, ~two orders of
  * magnitude faster per row, which is what makes brute-force scoring viable
  * as the scan-speed baseline at large scale (builder brief: a custom
  * `Expression` with `doGenCode` beats a UDF).
  *
  * Inputs must be `array<double>` (cast upstream); summation is sequential
  * left-to-right, bit-identical to the fold form and the DuckDB oracle's
  * `list_dot_product`.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Σ aᵢ·bᵢ over two `array<double>` columns, codegen'd. */
  def vectorDot(a: Column, b: Column): Column =
    GraftBridge.column(VectorDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
