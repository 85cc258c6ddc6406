package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column ⇄ Expression converters (Spark 4
  * moved `Column` onto ColumnNode; `classic.ExpressionUtils` is
  * `private[sql]`). Standard extension-library shim — the only file outside
  * the `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — needed to surface custom logical operators
    * (planned by an injected Strategy) through the public Dataset API.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (child for custom nodes). */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Release the executor blocks pinned by a (local)checkpointed DataFrame.
    * `Dataset.unpersist` only talks to the CacheManager; checkpoint blocks
    * are persisted directly on the underlying RDD, so iterative operators
    * that checkpoint per round must drop the previous round's blocks here
    * or accumulate one full label-table copy per iteration. Only call once
    * the data is provably never read again — a truncated-lineage RDD cannot
    * recompute its blocks.
    */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** `bloom_filter_agg` as a Column: the aggregate exists in Catalyst
    * (it backs the optimizer's runtime DPP/join filters) but is only in
    * the INTERNAL function registry, not the SQL one — same shim rule as
    * the converters above. `child` must be a LongType key (xxhash64).
    */
  def bloomFilterAgg(child: Column, estimatedItems: Long,
                     numBits: Long): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(child),
        catalyst.expressions.Literal(estimatedItems),
        catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Bounded-wait read of an [[Observation]] for call sites where the
    * observed plan node may never execute (AQE empty-relation
    * propagation can fold away a join side wholesale, and the metrics
    * listener fires asynchronously after the action returns):
    * `Observation.get` would block forever on the pruned plan, and
    * 4.1's `getOrEmpty` NPEs on its own empty-row path. Returns the
    * metrics map once the listener delivers (normally milliseconds
    * after the action), or empty after `timeoutMs` so the caller can
    * fall back to an explicit computation.
    */
  def observedOrEmpty(obs: Observation,
                      timeoutMs: Long = 3000L): Map[String, Any] =
    try {
      val row = scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(timeoutMs,
          java.util.concurrent.TimeUnit.MILLISECONDS))
      if (row == null || row.schema == null) Map.empty
      else row.schema.fieldNames.zip(row.toSeq).toMap
    } catch { case _: java.util.concurrent.TimeoutException => Map.empty }

  /** Drain the async listener bus (`listenerBus` is `private[spark]`) —
    * lets a spec read listener-collected metrics (e.g. job counts)
    * deterministically right after an action returns.
    */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long = 10000L): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
}
