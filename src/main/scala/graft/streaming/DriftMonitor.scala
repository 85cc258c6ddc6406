package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Divergence

/** Streaming distribution-drift monitor — the observability loop a
  * production ingest pipeline runs NEXT TO the corpus builder: every
  * micro-batch's token distribution is scored against a FROZEN reference
  * ([[Divergence.writeReferenceCounts]], fitted once on the accepted
  * corpus), and one metrics row per batch lands in an append-only
  * parquet log. A JS step-change in that log is the "the crawl changed
  * under us" alarm that catches upstream breakage (encoding shifts,
  * spam floods, a source going dark) before the quality gates silently
  * change their accept rate.
  *
  * Same execution contract as [[CorpusStream]]: `Trigger.AvailableNow`
  * micro-batches off a parquet directory, checkpointed source progress
  * (exactly-once per batch id), `foreachBatch` driving a batch-side
  * operator. Per batch the work is one tokenize+count aggregation of
  * the batch plus a join against the bounded reference table — the
  * reference is never re-aggregated.
  */
object DriftMonitor {

  /** Quarantine configuration for wiring drift INTO the corpus loop
    * ([[CorpusStream.start]]'s `drift` parameter) — the alarm promoted to
    * an actuator: a micro-batch whose JS divergence against the frozen
    * reference exceeds `maxJs` is diverted WHOLE to `quarantinePath`
    * instead of entering the gate chain, so a poisoned crawl (encoding
    * break, spam flood) cannot reach the corpus or its indexes; the
    * quarantined parquet is the triage queue. Every batch's metrics row
    * still lands at `metricsPath` (quarantined or not — the log is how an
    * operator sees the step-change).
    */
  case class Gate(referencePath: String, maxJs: Double,
                  quarantinePath: String, metricsPath: String)

  /** Start the monitor: per micro-batch append one row
    * (batch_id, vocab, n_a, n_b, kl_ab, kl_ba, js) to `metricsPath`.
    * Empty batches write nothing.
    */
  def start(spark: SparkSession, sourceDir: String, schema: StructType,
            referencePath: String, metricsPath: String, checkpoint: String,
            textCol: String = "text"): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          Divergence.divergenceAgainstReference(batch, textCol, referencePath)
            .withColumn("batch_id", lit(id))
            .write.mode("append").parquet(metricsPath)
        ()
      }
      .start()

  /** The EMBEDDING-space monitor: same execution contract as [[start]],
    * but each micro-batch is scored with
    * [[Divergence.embeddingDivergenceAgainstIndex]] against a frozen IVF
    * index + its cell-occupancy sidecar instead of a token-count
    * reference — the alarm for drift the token monitor is blind to (an
    * embedding model version bump, an out-of-domain content cluster
    * whose TEXT statistics look ordinary). Runs beside the token
    * monitor, one metrics log each; per batch the work is one narrow
    * batch scan plus a join of two ≤ nlist-row frames.
    */
  def startEmbedding(spark: SparkSession, sourceDir: String,
                     schema: StructType, indexPath: String,
                     metricsPath: String, checkpoint: String,
                     vecCol: String = "embedding"): StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty)
          Divergence.embeddingDivergenceAgainstIndex(batch, vecCol,
              indexPath)
            .withColumn("batch_id", lit(id))
            .write.mode("append").parquet(metricsPath)
        ()
      }
      .start()
}
