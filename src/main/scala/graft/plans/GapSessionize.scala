package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Whole-operator Catalyst extension: gap-based sessionization as ONE
  * physical pass.
  *
  * The declarative form needs two window passes over a user-keyed shuffle
  * (lag → gap flag, running sum → session id) plus a grouped aggregation —
  * three sort-aware operators over the same partitioning. This operator
  * declares `requiredChildDistribution` = clustered by user and
  * `requiredChildOrdering` = (user, ts), so Catalyst plans exactly ONE
  * exchange + sort, and `doExecute` folds session assignment and
  * aggregation into a single forward scan per partition: O(1) state per
  * open session, no window buffers, no second pass. At 100 TB that is one
  * shuffle of the events table and a streaming-friendly scan — the same
  * shape `flatMapGroupsWithState` produces, but without per-group object
  * allocation or Dataset encoders.
  *
  * Semantics match `Queries.queries("q_sessionize")` exactly (new session
  * when the gap STRICTLY exceeds `gapUs`; sessions numbered 1.. per user in
  * time order; duration = max(ts) − min(ts) in µs) and the operator is
  * verified against the same DuckDB oracle.
  *
  * Null handling: rows with a null user or null ts are EXCLUDED —
  * [[Sessionize.native]] filters them before the node (pushed to the scan)
  * and `doExecute` skips them defensively. InternalRow.getLong on a null
  * slot returns an undefined value, so letting nulls through would silently
  * merge them into user 0 / epoch 0 instead of grouping them like the
  * declarative window form does.
  */
case class GapSessionize(
    user: Attribute, ts: Attribute, gapUs: Long,
    child: LogicalPlan)(
    // second parameter list + otherCopyArgs: the generated output
    // attributes must keep their exprIds across copy()/transform, or every
    // optimizer pass would re-mint them and break downstream resolution
    val sessionId: Attribute,
    val nEvents: Attribute,
    val durationUs: Attribute) extends UnaryNode {
  require(user.dataType == LongType, "sessionize user key must be bigint")
  require(ts.dataType == TimestampNTZType || ts.dataType == TimestampType ||
    ts.dataType == LongType, "sessionize ts must be a timestamp (µs) or long")

  override def output: Seq[Attribute] = Seq(user, sessionId, nEvents, durationUs)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      Seq(sessionId, nEvents, durationUs))
  override protected def otherCopyArgs: Seq[AnyRef] =
    sessionId :: nEvents :: durationUs :: Nil
  override protected def withNewChildInternal(newChild: LogicalPlan): GapSessionize =
    copy(child = newChild)(sessionId, nEvents, durationUs)
}

object GapSessionize {
  def apply(user: Attribute, ts: Attribute, gapUs: Long,
            child: LogicalPlan): GapSessionize =
    new GapSessionize(user, ts, gapUs, child)(
      AttributeReference("session_id", LongType, nullable = false)(),
      AttributeReference("n_events", LongType, nullable = false)(),
      AttributeReference("duration_us", LongType, nullable = false)())
}

object GapSessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GapSessionize =>
      GapSessionizeExec(g.user, g.ts, g.gapUs, g.output, planLater(g.child)) :: Nil
    case _ => Nil
  }
}

case class GapSessionizeExec(
    user: Attribute, ts: Attribute, gapUs: Long,
    output: Seq[Attribute], child: SparkPlan) extends UnaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(user :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(user, Ascending), SortOrder(ts, Ascending)))
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = Seq(SortOrder(user, Ascending))
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output.drop(1))

  override protected def doExecute(): RDD[InternalRow] = {
    val userIdx = child.output.indexWhere(_.exprId == user.exprId)
    val tsIdx = child.output.indexWhere(_.exprId == ts.exprId)
    require(userIdx >= 0 && tsIdx >= 0, "sessionize columns not in child output")
    val schema = output.map(_.dataType)
    child.execute().mapPartitions { it =>
      new Iterator[InternalRow] {
        private val proj = UnsafeProjection.create(schema.toArray)
        private val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(4)
        private var curUser = 0L
        private var haveUser = false
        private var sessionOrdinal = 0L
        private var lastTs = 0L
        private var minTs = 0L
        private var count = 0L
        private var pendingEmit: InternalRow = _

        // close the open session into `pendingEmit`
        private def close(): Unit = {
          out.update(0, curUser)
          out.update(1, sessionOrdinal)
          out.update(2, count)
          out.update(3, lastTs - minTs)
          pendingEmit = proj(out)
        }

        private def advanceTo(u: Long, t: Long): Unit = {
          if (!haveUser || u != curUser) {
            if (haveUser) close()
            curUser = u; haveUser = true
            sessionOrdinal = 1L; minTs = t; count = 0L
          } else if (t - lastTs > gapUs) {
            close()
            sessionOrdinal += 1L; minTs = t; count = 0L
          }
          lastTs = t; count += 1L
        }

        override def hasNext: Boolean = {
          while (pendingEmit == null && it.hasNext) {
            val row = it.next()
            // null key/ts rows are excluded (see class doc) — getLong on a
            // null slot would fold them into user 0 / epoch 0
            if (!row.isNullAt(userIdx) && !row.isNullAt(tsIdx)) {
              advanceTo(row.getLong(userIdx), row.getLong(tsIdx))
            }
          }
          if (pendingEmit == null && haveUser) { close(); haveUser = false }
          pendingEmit != null
        }

        override def next(): InternalRow = {
          val r = pendingEmit; pendingEmit = null; r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GapSessionizeExec =
    copy(child = newChild)
}

/** Public API for the native sessionize operator. */
object Sessionize {
  /** Gap-based sessions of `df` keyed by `userCol` over `tsCol`
    * (timestamp; gap in seconds): one shuffle, one pass. Rows with a null
    * user or ts are excluded (see [[GapSessionize]] doc). Requires the
    * [[GapSessionizeStrategy]] to be installed (see [[GraftExtensions]]).
    */
  def native(df: DataFrame, userCol: String, tsCol: String,
             gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    // pre-project so column pruning below the custom node is explicit;
    // the null filter is pushed down to the scan
    val slim = df.select(userCol, tsCol)
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
    val plan = GraftBridge.analyzed(slim)
    val user = plan.output.find(_.name == userCol).get
    val ts = plan.output.find(_.name == tsCol).get
    GraftBridge.ofRows(spark, GapSessionize(user, ts, gapSeconds * 1000000L, plan))
  }
}
