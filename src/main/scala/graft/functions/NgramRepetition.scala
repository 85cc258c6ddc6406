package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Repeated word-n-gram fraction (1 − distinct/total) as ONE native
  * expression — the Gopher repetition signal, value-identical to the
  * higher-order-function formula documented in
  * [[TextAnalysis.repetitionRatio]] but O(len·n) in a tight JVM loop
  * instead of O(len²) interpreted: the HOF form re-evaluates
  * `slice(toks, i, n)` per emitted gram with no subexpression
  * elimination, and profiled as the single most expensive quality gate
  * (3.4 s of the 4.0 s corpus_filter_kept bench row at sf0.1).
  *
  * Parity contract with the DuckDB twin (text_repetition / funnel p3):
  * lowercase via UTF8String.toLowerCase (locale-independent, = Spark
  * `lower`), trim of ASCII spaces (= Spark `trim`), `\s+` split with
  * empties dropped, grams compared by exact string equality. Null
  * handling (null text → 0.0, like the twin's CASE) lives in the column
  * builder's `coalesce`, keeping the expression a standard
  * null-propagating UnaryExpression.
  */
case class NgramRepetitionExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_repetition requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType

  def compute(input: UTF8String): Double = {
    // UTF8String.toLowerCase/trim match Spark's lower()/trim() exactly
    // (locale-independent lowercase; ASCII-space trim)
    val s = input.toLowerCase.trim.toString
    val toks = s.split("\\s+").filter(_.nonEmpty)
    val total = toks.length - (n - 1)
    if (total <= 0) return 0.0
    val seen = new java.util.HashSet[String](total * 2)
    var distinct = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    1.0 - distinct.toDouble / total
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ngramRepetition", this,
      classOf[NgramRepetitionExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramRepetitionExpr =
    copy(child = newChild)
}

object NgramRepetition {
  /** Repeated word-n-gram fraction; null text scores 0.0 (twin parity). */
  def ngramRepetition(text: Column, n: Int): Column =
    coalesce(
      GraftBridge.column(NgramRepetitionExpr(GraftBridge.expression(text), n)),
      lit(0.0))
}
