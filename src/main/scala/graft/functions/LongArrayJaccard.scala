package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Jaccard similarity of two DISTINCT-element `array<long>` columns as one
  * native pass: copy, sort, merge-count the intersection —
  * |A∩B| / (|A| + |B| − |A∩B|). Zero boxing, no per-pair hash sets.
  *
  * Replaces `size(array_intersect)/size(array_union)` in the hashed-shingle
  * verification paths: Spark's generic set expressions build an OpenHashSet
  * of boxed values per PAIR, which dominated the exact-Jaccard ground-truth
  * scan (125k pairs × ~1k-element arrays). Inputs must already be distinct
  * (true for `hashed_shingles` output); empty-vs-empty is 0.0 like the
  * generic form (union empty → 0 by convention).
  */
case class LongArrayJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_long requires two array<bigint> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = xs(i); val y = ys(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jaccardLong", this,
      classOf[LongArrayJaccardExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayJaccardExpr =
    copy(left = newLeft, right = newRight)
}

/** Positionwise match count of two `array<long>` columns as one native
  * loop — the MinHash signature-agreement estimator's core. Replaces the
  * `aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0, +)` fold
  * (interpreted lambda per element) in the LSH prefilter and the indexed
  * dedup estimate. Identical semantics: positions beyond the shorter
  * array count 0 (zip_with pads with null → the IF's else-0), null
  * arrays → null.
  */
case class LongArrayMatchCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"match_count_long requires two array<bigint> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType

  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("matchCountLong", this,
      classOf[LongArrayMatchCountExpr].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayMatchCountExpr =
    copy(left = newLeft, right = newRight)
}

object LongArrayJaccard {
  def jaccardLong(a: Column, b: Column): Column =
    GraftBridge.column(LongArrayJaccardExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def matchCountLong(a: Column, b: Column): Column =
    GraftBridge.column(LongArrayMatchCountExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
