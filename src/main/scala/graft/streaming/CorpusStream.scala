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
            drift: Option[DriftMonitor.Gate] = None)
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
                batch.write.mode("append").parquet(g.quarantinePath)
                true
              } else false
            } finally
              org.apache.spark.sql.GraftBridge.unpersistCheckpoint(m)
          }
        }
        if (!quarantined)
          CorpusPipeline.dedupAndAppend(batch, corpusPath, indexPath,
            idCol, textCol, threshold, gates, benchmark, contaminationN,
            ann, lm, sq, dsir, lrq)
        ()
      }
      .start()

  /** Outcome of a [[reprocessQuarantine]] attempt: the measured JS of the
    * queue against the (possibly updated) reference, whether the queue was
    * released through the gate chain, and how many docs actually landed
    * (released minus gate failures minus already-present dups).
    */
  case class ReprocessResult(js: Double, released: Boolean, admitted: Long)

  /** Triage path for the quarantine queue — without it quarantine is a
    * grave, not a queue: [[DriftMonitor.Gate]] diverts shifted batches to
    * `quarantinePath` and nothing ever re-admits them, even after the
    * operator decides the "drift" was actually the world changing and
    * refits the reference distribution.
    *
    * Re-gates the WHOLE queue against the reference at `referencePath`
    * (typically an UPDATED [[graft.operators.Divergence.writeReferenceCounts]]
    * sidecar, not the one that quarantined it) at threshold `maxJs`. If it
    * now clears, the queue flows through the SAME
    * [[CorpusPipeline.dedupAndAppend]] gate chain as a live batch — and
    * that shared path is what makes re-admission exactly-once: any doc a
    * previous (crashed or duplicate) reprocess already appended matches
    * its own signatures in the MinHash index and drops, so re-running
    * this method is always safe. After a successful release the queue
    * directory is retired to a dot-prefixed `__drained` sibling
    * (invisible to Spark listings, one level of audit trail); a crash
    * between the append and the retire leaves the queue in place and the
    * retry admits zero.
    *
    * A still-divergent queue is left untouched (`released = false`) —
    * quarantine decisions stay distribution-level, per the gate's design.
    * The divergence row is appended to `metricsPath` either way with
    * `batch_id = -1` marking it as a triage (not live-stream) measurement.
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
                          lrq: Option[CorpusPipeline.LrGate] = None)
      : ReprocessResult = {
    val qDir = new java.io.File(quarantinePath)
    if (!qDir.exists()) return ReprocessResult(0.0, released = false, 0L)
    val queue = spark.read.parquet(quarantinePath)
    if (queue.isEmpty) return ReprocessResult(0.0, released = false, 0L)
    val m = graft.operators.Divergence
      .divergenceAgainstReference(queue, textCol, referencePath)
      .withColumn("batch_id", lit(-1L))
      .localCheckpoint(true)
    try {
      metricsPath.foreach(p => m.write.mode("append").parquet(p))
      val js = m.select(col("js")).collect().head.getDouble(0)
      if (js > maxJs) ReprocessResult(js, released = false, 0L)
      else {
        val admitted = CorpusPipeline.dedupAndAppend(queue, corpusPath,
          indexPath, idCol, textCol, threshold, gates, benchmark,
          contaminationN, ann, lm, sq, dsir, lrq)
        val drained =
          graft.sources.Compaction.stagingDir(qDir, "drained")
        if (drained.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete()
          }
          rm(drained)
        }
        if (!qDir.renameTo(drained))
          throw new java.io.IOException(
            s"cannot retire drained quarantine $quarantinePath")
        ReprocessResult(js, released = true, admitted)
      }
    } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(m)
  }
}
