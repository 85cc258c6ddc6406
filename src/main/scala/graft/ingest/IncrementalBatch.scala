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
  *   window — bug B4; SURVEY.md §7.4.4).
  */
class IncrementalBatch(
    spark: SparkSession,
    sourcePath: String,
    sinkPath: String,
    watermarkPath: String,
    tsCol: String,
    transform: DataFrame => DataFrame = identity,
    idempotentSink: Boolean = false) {

  /** Run one incremental batch; returns rows written and the watermark. */
  def run(): BatchResult = {
    val src = spark.read.parquet(sourcePath)
    val wm = Watermark.read(watermarkPath)
    val fresh = wm match {
      case Some(ts) => src.filter(col(tsCol) > lit(ts).cast(src.schema(tsCol).dataType))
      case None => src // first run: no filter (reference F1 semantics)
    }
    val out = transform(fresh)
    // C3 empty-batch short-circuit: one cheap action; limit(1) keeps it O(1)
    if (out.limit(1).isEmpty) return BatchResult(0L, wm)

    val obs = org.apache.spark.sql.Observation()
    val observed = out.observe(obs,
      count(lit(1)).as("rows"), max(col(tsCol)).as("max_ts"))
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
    val metrics = obs.get
    val rows = metrics("rows").asInstanceOf[Long]
    val maxTs = Option(metrics("max_ts")).map(_.toString)
    maxTs.foreach(Watermark.write(watermarkPath, _))
    BatchResult(rows, maxTs.orElse(wm))
  }
}
