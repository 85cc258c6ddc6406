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
}
