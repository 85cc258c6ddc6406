package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted mergeable sketch state for the corpus loop — the incremental
  * serving story for distinct counts and value quantiles.
  *
  * The sketch AGGREGATES ([[graft.ExtQueries]]'s `q_approx_distinct` /
  * `q_approx_quantiles` family) prove the math, but they recompute from
  * raw data per question. At 100 TB the point of a sketch is that its
  * state is small and MERGEABLE: the corpus loop appends one sketch row
  * per admitted batch — O(batch) work — and corpus-level questions are
  * answered by merging the accumulated rows — O(#batches), never
  * O(corpus). This is the same frozen-sidecar discipline the MinHash and
  * ANN indexes already follow (append per batch, bounded serve-time
  * state), applied to monitoring.
  *
  * Per-batch row (one parquet row, one small file):
  *   - `n`         batch row count
  *   - `hll`       Datasketches HLL registers over `distinctExpr`
  *                 (`hll_sketch_agg`) — union across batches is
  *                 register-level merge, so the merged estimate carries
  *                 the single-sketch rsd (≈ 1.04 / sqrt(2^lgConfigK))
  *                 regardless of batch count. (It is NOT guaranteed to
  *                 be numerically identical to a single-pass sketch:
  *                 the union promotes coupon-list state to the HLL
  *                 array earlier, trading sparse-mode exactness for the
  *                 same rsd contract — the `q_sketch_sidecar_gap` twin
  *                 enforces the contract, not the identity.)
  *   - `qs`        K+1 equi-depth boundaries of `valueExpr`
  *                 (`percentile_approx` at probabilities j/K) — a
  *                 mergeable quantile summary: modelling the batch as K
  *                 point masses of n/K at the upper boundaries bounds the
  *                 merged CDF error by 1/K + 1/accuracy of RANK, so a
  *                 served quantile is within 2/K + 1/accuracy of rank of
  *                 the truth (the bound [[servedQuantiles]] documents and
  *                 the `q_sketch_sidecar_gap` twin enforces)
  *   - `k`, `accuracy`, `lgk`  the configuration, stored per row so a
  *                 misconfigured mixed sidecar fails loudly at serve time
  *
  * Crash/retry semantics inside [[graft.ingest.CorpusPipeline
  * .dedupAndAppend]]: the sketch append runs with the other monitoring
  * sidecars BEFORE the MinHash gate append, so a crash-retry REPEATS it
  * rather than skipping it. A repeated HLL row is harmless (union is
  * idempotent); a repeated quantile row double-weights one batch — a
  * bounded, visible distortion, the same stance the ANN append takes.
  *
  * The sidecar accumulates one small file per batch; compact it on the
  * corpus loop's existing cadence (plain [[Compaction.compact]] — the
  * rows are unpartitioned and self-describing, so a file-level rewrite
  * changes nothing semantically).
  */
object SketchSidecar {

  /** @param distinctExpr SQL expression whose distinct cardinality is
    *   tracked (e.g. "doc_id", "xxhash64(text)")
    * @param valueExpr numeric SQL expression whose quantiles are tracked
    *   (e.g. "length(text)")
    * @param lgConfigK HLL register count = 2^lgConfigK; rsd ≈
    *   1.04/sqrt(2^lgConfigK) (12 → ≈ 1.6%)
    * @param numBuckets K equi-depth buckets per batch summary; merged
    *   rank error ≤ 2/K + 1/accuracy
    * @param compactEvery when > 0, every N-th append compacts the
    *   sidecar's files (content-preserving; counter rides in the sidecar
    *   dir as `_maint_appends`, invisible to the parquet scan)
    */
  case class Cfg(sidecarPath: String, distinctExpr: String,
                 valueExpr: String, lgConfigK: Int = 12,
                 numBuckets: Int = 256, accuracy: Int = 10000,
                 compactEvery: Int = 0) {
    require(lgConfigK >= 4 && lgConfigK <= 21, s"lgConfigK=$lgConfigK")
    require(numBuckets >= 2, s"numBuckets=$numBuckets")
    require(accuracy >= 100, s"accuracy=$accuracy")
  }

  /** One narrow aggregation over the batch → one appended sidecar row.
    * No driver state beyond the single collected-at-write row Spark's
    * writer handles; the batch is scanned exactly once.
    */
  def appendBatch(batch: DataFrame, cfg: Cfg): Unit = {
    val k = cfg.numBuckets
    val probs = array((0 to k).map(j => lit(j.toDouble / k)): _*)
    batch.agg(
        count(lit(1)).as("n"),
        hll_sketch_agg(expr(cfg.distinctExpr), cfg.lgConfigK).as("hll"),
        percentile_approx(expr(cfg.valueExpr).cast("double"), probs,
          lit(cfg.accuracy)).as("qs"))
      .withColumn("k", lit(k))
      .withColumn("accuracy", lit(cfg.accuracy))
      .withColumn("lgk", lit(cfg.lgConfigK))
      .coalesce(1)
      .write.mode("append").parquet(cfg.sidecarPath)
  }

  /** Merged distinct-count estimate over every appended batch: one row
    * `(batches, distinct_estimate)`. Register-max union at the rows'
    * common lgConfigK (a mixed sidecar fails loudly rather than
    * silently widening the error); within the sketch's rsd of the true
    * corpus distinct count — see the class doc for why it can differ
    * from a single-pass sketch's estimate while both honor the rsd.
    */
  def servedDistinct(spark: SparkSession, sidecarPath: String): DataFrame =
    spark.read.parquet(sidecarPath)
      .agg(count(lit(1)).as("batches"),
        hll_sketch_estimate(hll_union_agg(col("hll")))
          .as("distinct_estimate"))

  /** Merged quantiles over every appended batch: one row `(p, value)` per
    * requested probability. Each batch contributes K point masses of
    * n/K at its equi-depth upper boundaries; the served value is the
    * smallest point whose merged cumulative mass reaches p·N.
    *
    * Rank-error contract (enforced by the `q_sketch_sidecar_gap` twin):
    * |true rank of served value − p| ≤ 2/numBuckets + 1/accuracy
    * (+ the 1/n granularity of a finite corpus). Derivation: the
    * point-mass CDF of one batch is within 1/K + 1/accuracy of its true
    * CDF everywhere, the weighted merge preserves that bound, and the
    * serve-side selection adds at most one point weight ≤ 1/K.
    *
    * The window below is single-partition by construction — it orders
    * #batches × K summary points (bounded metadata, exactly like the
    * centroid sidecars), never corpus rows.
    */
  def servedQuantiles(spark: SparkSession, sidecarPath: String,
                      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0))
    import spark.implicits._
    val rows = spark.read.parquet(sidecarPath)
      .where(col("qs").isNotNull && col("n") > 0)
    // the j-th upper boundary (qs[1..K] — the leading qs[0] is the batch
    // minimum, an anchor only) carries mass n/K
    val points = rows.select(
        explode(expr("slice(qs, 2, size(qs) - 1)")).as("v"),
        (col("n").cast("double") / col("k")).as("w"))
    val cum = points
      .withColumn("cum", sum(col("w")).over(
        Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("w")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    cum.crossJoin(broadcast(ps.toDF("p")))
      .where(col("cum") >= col("p") * col("total") - lit(1e-9))
      .groupBy(col("p"))
      .agg(min(col("v")).as("value"))
      .orderBy(col("p"))
  }
}
