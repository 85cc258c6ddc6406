package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ingest.CorpusPipeline

/** Streaming form of the corpus-builder loop: Structured Streaming's file
  * source supplies incremental discovery and checkpointed exactly-once
  * batch tracking (replacing [[graft.ingest.Watermark]]'s sidecar), and
  * each micro-batch flows through the SAME dedup-and-append gate as the
  * batch pipeline ([[CorpusPipeline.dedupAndAppend]]) via `foreachBatch`.
  *
  * `foreachBatch` is the right tool here — the gate does multi-sink work
  * (corpus + index appends) and joins against out-of-stream state (the
  * index), neither of which a plain streaming sink can express. Restarting
  * from the checkpoint resumes at the first unprocessed source file; a
  * batch replayed after a mid-gate crash re-matches its already-indexed
  * rows and drops them, the same retry story as the batch loop.
  */
object CorpusStream {

  def start(spark: SparkSession, sourceDir: String, schema: StructType,
            corpusPath: String, indexPath: String, checkpoint: String,
            idCol: String = "doc_id", textCol: String = "text",
            threshold: Double = 0.8,
            gates: Seq[(String, org.apache.spark.sql.Column)] = Seq.empty,
            benchmark: Option[DataFrame] = None,
            contaminationN: Int = 8,
            ann: Option[CorpusPipeline.AnnIndex] = None,
            lm: Option[CorpusPipeline.LmGate] = None,
            sq: Option[CorpusPipeline.SqIndexCfg] = None,
            dsir: Option[CorpusPipeline.DsirGate] = None,
            lrq: Option[CorpusPipeline.LrGate] = None,
            drift: Option[DriftMonitor.Gate] = None,
            indexCompactEvery: Int = 0)
      : StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // drift gate FIRST (round 12): an out-of-distribution batch is
        // quarantined whole — per-doc quality gates are tuned for the
        // reference distribution and silently misjudge a shifted one, so
        // the distribution-level decision must precede them. The metrics
        // row is computed ONCE (one collect), logged for every batch, and
        // only then compared — so the append-only log shows the alarm
        // that caused each quarantine.
        val quarantined = drift.exists { g =>
          if (batch.isEmpty) false
          else {
            val m = graft.operators.Divergence
              .divergenceAgainstReference(batch, textCol, g.referencePath)
              .withColumn("batch_id", lit(id))
              .localCheckpoint(true)
            try {
              m.write.mode("append").parquet(g.metricsPath)
              val js = m.select(col("js")).collect().head.getDouble(0)
              if (js > g.maxJs) {
                // the micro-batch id rides along so triage
                // ([[reprocessQuarantine]]) can re-gate each quarantined
                // batch SEPARATELY — pooled re-gating would let batches
                // with different shifts mask each other
                batch.withColumn("__q_batch", lit(id))
                  .write.mode("append").parquet(g.quarantinePath)
                true
              } else false
            } finally
              org.apache.spark.sql.GraftBridge.unpersistCheckpoint(m)
          }
        }
        if (!quarantined)
          CorpusPipeline.dedupAndAppend(batch, corpusPath, indexPath,
            idCol, textCol, threshold, gates, benchmark, contaminationN,
            ann, lm, sq, dsir, lrq, indexCompactEvery)
        ()
      }
      .start()

  /** Outcome of a [[reprocessQuarantine]] attempt: quarantined batches
    * seen, batches that cleared the updated reference and flowed the gate
    * chain, and how many docs actually landed (released minus gate
    * failures minus already-present dups).
    */
  case class ReprocessResult(batches: Long, released: Long, admitted: Long)

  /** Triage path for the quarantine queue — without it quarantine is a
    * grave, not a queue: [[DriftMonitor.Gate]] diverts shifted batches to
    * `quarantinePath` and nothing ever re-admits them, even after the
    * operator decides the "drift" was actually the world changing and
    * refits the reference distribution.
    *
    * Each quarantined batch (the `__q_batch` tag stamped at quarantine
    * time; pre-tag queues triage as one batch) is re-gated SEPARATELY
    * against the reference at `referencePath` (typically an UPDATED
    * [[graft.operators.Divergence.writeReferenceCounts]] sidecar, not the
    * one that quarantined it) at threshold `maxJs` — per-batch because
    * pooling the queue would gate a MIXTURE: a clearable batch could be
    * held hostage by a still-toxic one, or a toxic batch could ride in
    * under the average. A batch that clears flows through the SAME
    * [[CorpusPipeline.dedupAndAppend]] gate chain as a live batch — and
    * that shared path is what makes re-admission exactly-once: any doc a
    * previous (crashed or duplicate) reprocess already appended matches
    * its own signatures in the MinHash index and drops, so re-running
    * this method is always safe.
    *
    * Queue maintenance: if every batch released, the directory is retired
    * to a dot-prefixed `__drained` sibling (invisible to Spark listings,
    * one level of audit trail); on a partial release the still-held
    * batches are rewritten in place via the staging + rename-swap
    * discipline. A crash between the appends and the queue rewrite leaves
    * the full queue on disk and the retry admits zero for the already-
    * landed batches. Per-batch divergence rows append to `metricsPath`
    * with `batch_id = -1` marking them as triage (not live-stream)
    * measurements.
    */
  def reprocessQuarantine(spark: SparkSession, quarantinePath: String,
                          referencePath: String, maxJs: Double,
                          corpusPath: String, indexPath: String,
                          metricsPath: Option[String] = None,
                          idCol: String = "doc_id", textCol: String = "text",
                          threshold: Double = 0.8,
                          gates: Seq[(String, org.apache.spark.sql.Column)] = Seq.empty,
                          benchmark: Option[DataFrame] = None,
                          contaminationN: Int = 8,
                          ann: Option[CorpusPipeline.AnnIndex] = None,
                          lm: Option[CorpusPipeline.LmGate] = None,
                          sq: Option[CorpusPipeline.SqIndexCfg] = None,
                          dsir: Option[CorpusPipeline.DsirGate] = None,
                          lrq: Option[CorpusPipeline.LrGate] = None,
                          indexCompactEvery: Int = 0)
      : ReprocessResult = {
    val qDir = new java.io.File(quarantinePath)
    if (!qDir.exists()) return ReprocessResult(0L, 0L, 0L)
    val raw = spark.read.parquet(quarantinePath)
    if (raw.isEmpty) return ReprocessResult(0L, 0L, 0L)
    // sever lineage from the files the partial-release rewrite swaps out
    val queue = (if (raw.columns.contains("__q_batch")) raw
      else raw.withColumn("__q_batch", lit(-1L)))
      .localCheckpoint(true)
    try {
      // bounded metadata: one id per quarantined micro-batch
      val batchIds = queue.select("__q_batch").distinct()
        .collect().map(_.getLong(0)).sorted
      var admitted = 0L
      val releasedIds = batchIds.filter { bid =>
        val b = queue.where(col("__q_batch") === bid).drop("__q_batch")
        val m = graft.operators.Divergence
          .divergenceAgainstReference(b, textCol, referencePath)
          .withColumn("batch_id", lit(-1L))
          .localCheckpoint(true)
        try {
          metricsPath.foreach(p => m.write.mode("append").parquet(p))
          val js = m.select(col("js")).collect().head.getDouble(0)
          if (js > maxJs) false
          else {
            admitted += CorpusPipeline.dedupAndAppend(b, corpusPath,
              indexPath, idCol, textCol, threshold, gates, benchmark,
              contaminationN, ann, lm, sq, dsir, lrq, indexCompactEvery)
            true
          }
        } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(m)
      }.toSet
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      if (releasedIds.size == batchIds.length) {
        val drained = graft.sources.Compaction.stagingDir(qDir, "drained")
        if (drained.exists()) rm(drained)
        if (!qDir.renameTo(drained))
          throw new java.io.IOException(
            s"cannot retire drained quarantine $quarantinePath")
      } else if (releasedIds.nonEmpty) {
        // partial release: rewrite the queue to the still-held batches
        // (checkpointed above, so the write does not read the files it is
        // about to replace)
        val staging = graft.sources.Compaction.stagingDir(qDir, "triage")
        queue.where(!col("__q_batch").isin(releasedIds.toSeq: _*))
          .write.mode("overwrite").parquet(staging.toString)
        graft.sources.Compaction.swapInto(quarantinePath, staging.toString)
      }
      ReprocessResult(batchIds.length.toLong, releasedIds.size.toLong,
        admitted)
    } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(queue)
  }
}
