package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream — "users who VIEWED,
  * then CLICKED, then PURCHASED, in that order": for steps s₁..sₙ,
  * t₁ = min ts matching s₁, and tᵢ = min ts matching sᵢ with ts > tᵢ₋₁
  * (strictly after the previous step — simultaneous events don't chain).
  *
  * Greedy-earliest chaining is COMPLETE for unbounded funnels: taking the
  * earliest feasible tᵢ₋₁ only loosens tᵢ's constraint, so a user
  * completes step i under this rule iff ANY strictly-increasing event
  * chain through the steps exists. (A max-span variant — "complete within
  * T of entry" — loses this property: the earliest entry is not always
  * the one that completes in time. Window the EVENTS by time before
  * calling if a bounded funnel is wanted.)
  *
  * Scale shape: one filtered grouped min per step, each equi-joined to
  * the previous stage keyed by user — n narrow aggregations sharing one
  * user-keyed shuffle partitioning, per-stage state of exactly one
  * timestamp per user. No per-user event sorting, no self-join over the
  * stream, no `collect_list` of a 100 TB day. Returns one row per user
  * that entered the funnel (matched s₁): (userCol, t_<step>...,
  * steps_completed).
  */
object Funnel {

  def funnel(events: DataFrame, userCol: String, tsCol: String,
             steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val names = steps.map(_._1)
    require(names.distinct == names, s"step names must be unique: $names")
    require(!names.contains(""), "step names must be non-empty")
    val first = events.filter(steps.head._2)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t_${names.head}"))
    // stage i joins ONLY (user, t_{i-1}) — the accumulated columns stay
    // out of the per-stage plans and come together in one left-join chain
    val frames = steps.tail.scanLeft(first) { case (prev, (name, pred)) =>
      val prevT = prev.columns.last
      events.filter(pred)
        .join(prev.select(col(userCol), col(prevT)), Seq(userCol))
        .where(col(tsCol) > col(prevT))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t_$name"))
    }
    frames.reduceLeft((a, b) => a.join(b, Seq(userCol), "left"))
      .withColumn("steps_completed",
        names.map(n => when(col(s"t_$n").isNotNull, 1).otherwise(0))
          .reduce(_ + _))
  }

  /** The funnel report: per step, how many users reached it and the
    * conversion from the previous step — one aggregation over
    * [[funnel]]'s per-user frame, rounded for cross-engine stability.
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   steps: Seq[(String, Column)]): DataFrame = {
    val f = funnel(events, userCol, tsCol, steps)
    val names = steps.map(_._1)
    val counts = f.agg(
      count(lit(1)).as(s"n_${names.head}"),
      names.tail.map(n => sum(when(col(s"t_$n").isNotNull, 1L)
        .otherwise(0L)).as(s"n_$n")): _*)
    // one row per step keeps the report shape stable however many steps
    counts.select(explode(array(names.zipWithIndex.map { case (n, i) =>
        struct(lit(i + 1).as("step"), lit(n).as("name"),
          col(s"n_$n").as("n_users"),
          (if (i == 0) lit(1.0)
           else round(col(s"n_$n").cast("double") /
             col(s"n_${names(i - 1)}"), 6)).as("conversion"))
      }: _*)).as("s"))
      .select(col("s.step"), col("s.name"), col("s.n_users"),
        col("s.conversion"))
  }

  /** Cohort retention matrix — the other canonical event-analytics
    * question next to the funnel: users cohorted by their FIRST active
    * day, one row `(cohort_day, offset, users)` per (cohort, day-offset
    * in 0..maxOffsetDays) counting the cohort's users active exactly
    * `offset` days after their first day. Exact, so it carries a full
    * DuckDB oracle.
    *
    * Scale shape: the stream is collapsed to DISTINCT (user, day) FIRST
    * — retention counts users, so active-user-days (bounded by
    * users × window) is the right working set, not raw events. The
    * first-day aggregation and the join both key on `user`, sharing one
    * shuffle partitioning, and because (user, day) rows are already
    * distinct the final cell count is a plain `count(1)` — no
    * count_distinct Expand over the matrix.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                maxOffsetDays: Int): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays=$maxOffsetDays")
    val e = events
      .select(col(userCol).as("user"), col(tsCol).cast("date").as("day"))
      .where(col("user").isNotNull && col("day").isNotNull)
      .distinct()
    val first = e.groupBy("user").agg(min(col("day")).as("cohort_day"))
    e.join(first, Seq("user"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("offset"))
      .where(col("offset") <= maxOffsetDays)
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("users"))
      .orderBy("cohort_day", "offset")
  }
}
