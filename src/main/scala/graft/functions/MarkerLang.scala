package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The stopword-marker vote of [[TextAnalysis.langId]] as ONE native
  * expression: tokenize once, score every language's marker set in a
  * single pass (5 O(1) set probes per token), return the first
  * declaration-order language reaching the max score — "und" when nothing
  * matches. The HOF form ran one interpreted `filter` per language (5
  * passes over the token array per row) and was the second most expensive
  * quality gate after the repetition ratio.
  *
  * The CJK branch stays OUTSIDE in the codegen'd `regexp_replace`
  * ([[TextAnalysis.langId]] composes it) — same division of labor as
  * [[NfcNormalizeExpr]]: native code only where Catalyst is slow.
  * Tokenization parity: UTF8String.toLowerCase/trim (= Spark
  * lower()/trim()), `\s+` split; marker membership is exact string
  * equality, identical to `isInCollection` and the DuckDB
  * `list_contains` twin.
  */
case class MarkerLangExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"marker_lang requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  // declaration-order languages and their marker sets, frozen at
  // construction from the single source of truth in TextAnalysis
  @transient private lazy val langs: Array[String] =
    TextAnalysis.langMarkers.map(_._1).toArray
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    TextAnalysis.langMarkers.map { case (_, ms) =>
      val s = new java.util.HashSet[String](ms.size * 2)
      ms.foreach(s.add)
      s
    }.toArray

  def compute(input: UTF8String): UTF8String = {
    val toks = input.toLowerCase.trim.toString.split("\\s+")
    val scores = new Array[Int](langs.length)
    var t = 0
    while (t < toks.length) {
      var l = 0
      while (l < sets.length) {
        if (sets(l).contains(toks(t))) scores(l) += 1
        l += 1
      }
      t += 1
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < scores.length) {
      // strict > keeps the EARLIEST declaration-order language on ties
      if (scores(l) > best) { best = scores(l); bestIdx = l }
      l += 1
    }
    UTF8String.fromString(if (bestIdx < 0) "und" else langs(bestIdx))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("markerLang", this,
      classOf[MarkerLangExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerLangExpr =
    copy(child = newChild)
}

/** Count of whitespace tokens (lower/trim/`\s+`, = the house
  * tokenization) that belong to `markers` — the native form of
  * `size(filter(toks, isInCollection(markers)))`, one tokenize pass and
  * one O(1) set probe per token instead of an interpreted lambda.
  * Backs [[TextAnalysis.stopwordRatio]] (and through it the quality
  * score) the way [[MarkerLangExpr]] backs the language vote.
  */
case class MarkerCountExpr(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"marker_count requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](markers.size * 2)
    markers.foreach(s.add)
    s
  }

  def compute(input: UTF8String): Int = {
    val toks = input.toLowerCase.trim.toString.split("\\s+")
    var c = 0
    var i = 0
    while (i < toks.length) {
      if (set.contains(toks(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("markerCount", this,
      classOf[MarkerCountExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCountExpr =
    copy(child = newChild)
}

object MarkerLang {
  /** Best marker-vote language ("und" when nothing matches). */
  def markerLang(text: Column): Column =
    GraftBridge.column(MarkerLangExpr(GraftBridge.expression(text)))

  /** Marker-set hit count over the house tokenization. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    GraftBridge.column(
      MarkerCountExpr(GraftBridge.expression(text), markers))
}
