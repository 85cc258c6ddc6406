package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.{HashedShinglesExpr, HyperplaneBucketExpr, LongArrayJaccardExpr, MinhashSigExpr, RollingHashExpr, SimHashExpr, VectorDot}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)`
  *
  * into the codegen'd [[VectorDot]] expression. Users (and the DuckDB-twin
  * SQL) can write the idiomatic HOF form and still get the native fused
  * loop — HOF lambdas are interpreted per element, ~100× slower. The
  * summation order is identical (sequential left fold) and [[VectorDot]]
  * reproduces the HOF form's null semantics exactly (null on null input,
  * length mismatch — zip_with pads with nulls — or any null element), so
  * the rewrite is value-preserving bit for bit on every input.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVars(body: Seq[Expression], args: Seq[NamedExpression]): Boolean =
    body.size == args.size &&
      body.zip(args).forall {
        case (v: NamedLambdaVariable, a: NamedLambdaVariable) =>
          v.exprId == a.exprId
        case _ => false
      } && body.map { case v: NamedLambdaVariable => v.exprId }.distinct.size == body.size

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(x, y, _), zipArgs, _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(l, r, _), mergeArgs, _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(finArg: NamedLambdaVariable), _))
        if zero == 0.0 &&
          isVars(Seq(x, y), zipArgs) &&
          isVars(Seq(l, r), mergeArgs) &&
          fin.exprId == finArg.exprId =>
        VectorDot(a, b)
    }
}

/** Session extensions: the HOF→native rewrite rule plus SQL registration of
  * the engine's custom expressions (`vector_dot`, `hashed_shingles`,
  * `hyperplane_bucket`) — `spark.sql` users get the same operators as the
  * DataFrame API. Install via
  * `.withExtensions(new GraftExtensions)` or [[GraftExtensions.register]]
  * on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectPlannerStrategy(_ => GapSessionizeStrategy)
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vector_dot",
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (es: Seq[Expression]) => VectorDot(es(0), es(1))),
    ("hashed_shingles",
      new ExpressionInfo(classOf[HashedShinglesExpr].getName, "hashed_shingles"),
      (es: Seq[Expression]) =>
        HashedShinglesExpr(es(0), intLit(es(1), "shingle size k"))),
    ("hyperplane_bucket",
      new ExpressionInfo(classOf[HyperplaneBucketExpr].getName, "hyperplane_bucket"),
      (es: Seq[Expression]) => HyperplaneBucketExpr(es(0),
        intLit(es(1), "nBits"), intLit(es(2), "tableSeed"))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinhashSigExpr].getName, "minhash_sig"),
      (es: Seq[Expression]) =>
        MinhashSigExpr(es(0), intLit(es(1), "numHashes"))),
    ("rolling_hash",
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (es: Seq[Expression]) => RollingHashExpr(es(0))),
    ("simhash",
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash"),
      (es: Seq[Expression]) => SimHashExpr(es(0))),
    ("jaccard_long",
      new ExpressionInfo(classOf[LongArrayJaccardExpr].getName, "jaccard_long"),
      (es: Seq[Expression]) => LongArrayJaccardExpr(es(0), es(1))),
    ("deflate_ratio",
      new ExpressionInfo(
        classOf[graft.functions.DeflateRatioExpr].getName, "deflate_ratio"),
      (es: Seq[Expression]) => graft.functions.DeflateRatioExpr(es(0))))

  /** Register the functions + rule + strategy on a running session. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    if (!spark.experimental.extraStrategies.contains(GapSessionizeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GapSessionizeStrategy
  }
}
