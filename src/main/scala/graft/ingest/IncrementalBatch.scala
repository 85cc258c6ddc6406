package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-incremental ingest: the Spark re-expression of the reference's
  * daily watermarked load (`/root/reference/src/topcv_pipeline.py:114-211`,
  * DAG `/root/reference/airflow/dags/topcv_flow.py:27-65`).
  *
  * One lazy plan replaces the reference's six processes and eight
  * serialization hops (SURVEY.md §3.1): read source → watermark filter
  * (pushed down to the parquet scan) → transform → append sink → advance
  * watermark. Empty batches short-circuit before touching the sink
  * (reference C3, `topcv_pipeline.py:204-211`).
  *
  * Scale notes: the ingest path is narrow (no shuffle); at 100 TB the
  * watermark predicate prunes to the new time-slice via parquet row-group
  * stats (or partition pruning if the source is date-partitioned), so cost
  * is O(new data), not O(table).
  */
final case class BatchResult(rowsWritten: Long, newWatermark: Option[String])

/** @param idempotentSink when true, each batch writes its own
  *   `__batch_id=<watermark>` partition with dynamic partition overwrite:
  *   retrying a batch whose sink succeeded but whose watermark commit
  *   failed overwrites the same partition instead of appending duplicates
  *   (the reference's own watermark advance is broken in exactly this
  *   window — bug B4; SURVEY.md §7.4.4). NOTE the sink schema then carries
  *   the extra `__batch_id` partition column — readers that must see the
  *   append-mode schema should `.drop("__batch_id")` after load.
  * @param readOptions options for the source read. An EVOLVING source
  *   (batches gaining columns) needs `mergeSchema=true` here: a plain
  *   parquet read infers the schema from an arbitrary file of the mix, so
  *   whether new columns surface would be nondeterministic. With merge,
  *   widened batches flow through and pre-widening sink rows read back as
  *   null in the new columns (pair with `mergeSchema` on the sink read).
  */
class IncrementalBatch(
    spark: SparkSession,
    sourcePath: String,
    sinkPath: String,
    watermarkPath: String,
    tsCol: String,
    transform: DataFrame => DataFrame = identity,
    idempotentSink: Boolean = false,
    readOptions: Map[String, String] = Map.empty) {

  /** Run one incremental batch; returns rows written and the watermark. */
  def run(): BatchResult = {
    val src = spark.read.options(readOptions).parquet(sourcePath)
    val wm = Watermark.read(watermarkPath)
    val fresh = wm match {
      case Some(ts) => src.filter(col(tsCol) > lit(ts).cast(src.schema(tsCol).dataType))
      case None => src // first run: no filter (reference F1 semantics)
    }
    // C3 empty-batch short-circuit: one cheap action; limit(1) keeps it
    // O(1). Probes the PRE-transform scan: a batch whose fresh rows are all
    // filtered out by the transform must still run (and advance the
    // watermark — those rows were processed; short-circuiting on the
    // transformed output would re-scan them on every subsequent run until
    // unrelated new data arrived). The probe is an UNOBSERVED twin of the
    // plan — an Observation freezes on the first completed action, so
    // letting it flow through the CollectMetrics nodes would lock in
    // metrics from a 1-row scan.
    if (fresh.limit(1).isEmpty) return BatchResult(0L, wm)

    // Watermark advance is observed PRE-transform: a transform that drops,
    // renames, or rewrites tsCol can neither crash the batch nor corrupt
    // the watermark, and rows the transform filters out still advance it
    // (they were processed — reprocessing them forever would be the bug).
    // Rows-written is observed post-transform, on what actually lands.
    val obsIn = org.apache.spark.sql.Observation()
    val obsOut = org.apache.spark.sql.Observation()
    val observed = transform(
        fresh.observe(obsIn, max(col(tsCol)).as("max_ts")))
      .observe(obsOut, count(lit(1)).as("rows"))
    if (idempotentSink) {
      val batchId = wm.map(_.replaceAll("[^0-9]", "")).getOrElse("initial")
      observed.withColumn("__batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(sinkPath)
    } else {
      observed.write.mode("append").parquet(sinkPath)
    }

    // advance watermark only after a successful sink commit (fixes B4)
    val rows = obsOut.get("rows").asInstanceOf[Long]
    val maxTs = Option(obsIn.get("max_ts")).map(_.toString)
    maxTs.foreach(Watermark.write(watermarkPath, _))
    BatchResult(rows, maxTs.orElse(wm))
  }
}
