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
            indexCompactEvery: Int = 0,
            sketch: Option[graft.sources.SketchSidecar.Cfg] = None,
            exactKeys: Option[graft.sources.BloomKeyIndex.Cfg] = None,
            dupLabels: Option[String] = None,
            corpusCompactEvery: Int = 0,
            dupLabelsPartitions: Int = 0,
            funnel: Option[String] = None,
            media: Option[CorpusPipeline.MediaGate] = None,
            textIndex: Option[graft.sources.TextIndex.Cfg] = None,
            forwardStore: Option[CorpusPipeline.ForwardStore] = None)
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
            ann, lm, sq, dsir, lrq, indexCompactEvery, sketch, exactKeys,
            dupLabels, corpusCompactEvery, dupLabelsPartitions, funnel,
            media, funnelBatchId = id, textIndex = textIndex,
            forwardStore = forwardStore)
        ()
      }
      .start()

  /** STREAMING takedown intake — the lifecycle verb's streaming twin:
    * takedown requests (GDPR tickets, license revocations, audit hits)
    * arrive as files of doc ids in `requestsDir`, each micro-batch
    * lands the TOMBSTONE overlay ([[graft.operators.Retraction
    * .tombstoneDocs]] — O(ids) writes, so invisibility is one
    * micro-batch behind the request, the SLA the overlay exists for),
    * and every `applyEvery`-th micro-batch runs the PHYSICAL pass
    * ([[graft.operators.Retraction.applyTombstones]] — the overlays
    * are the worklist, so the cadence needs no request memory;
    * `applyEvery = 0` leaves the excision to an external maintenance
    * job). Both verbs are idempotent, so a micro-batch replayed from
    * the checkpoint re-lands the same state; an optional append-only
    * ledger records one row per request batch (`takedown_ts` dedupes
    * replays, the funnel discipline).
    */
  def startTakedowns(spark: SparkSession, requestsDir: String,
                     schema: StructType, checkpoint: String,
                     artifacts: graft.operators.Retraction.Artifacts,
                     applyEvery: Int = 0,
                     ledgerPath: Option[String] = None): StreamingQuery = {
    require(applyEvery >= 0, s"applyEvery=$applyEvery")
    spark.readStream.schema(schema).parquet(requestsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val r = graft.operators.Retraction.tombstoneDocs(spark,
            batch.select(artifacts.idCol), artifacts.idCol, artifacts)
          ledgerPath.foreach { lp =>
            import spark.implicits._
            Seq((id, r.requested, System.currentTimeMillis()))
              .toDF("batch_id", "n_requested", "takedown_ts")
              .coalesce(1).write.mode("append").parquet(lp)
          }
        }
        if (applyEvery > 0 && (id + 1) % applyEvery == 0)
          graft.operators.Retraction.applyTombstones(spark, artifacts)
        ()
      }
      .start()
  }

  /** Outcome of a [[rejectQuarantined]] call: quarantined batches
    * permanently rejected and how many distinct docs were retracted
    * across every configured artifact (tombstoned, for `lazily` calls).
    */
  case class RejectResult(batches: Long, docsRetracted: Long)

  /** PERMANENT rejection — the third triage verb next to release and
    * hold, enabled by [[graft.operators.Retraction]]: the operator has
    * decided a quarantined batch is poison (bad crawl, license problem,
    * adversarial injection) and it must neither re-enter triage nor
    * leave residue in any artifact. Holding can't do this (held batches
    * rejoin the queue forever), and deleting the queue rows alone would
    * leak whatever a PARTIALLY-failed earlier run already committed:
    * provenance edges land BEFORE the corpus append by design, and a
    * [[CorpusPipeline.PostAppendFailure]] leaves corpus rows (and
    * possibly ANN/text/sketch appends) committed with the batch back in
    * quarantine. So rejection = compensate-then-drop:
    *
    *  1. claim the queue (the [[reprocessQuarantine]] rename discipline
    *     — shared claim state: recover a crashed rejection with THIS
    *     verb and the same ids before running any reprocess, or the
    *     recovered claim would send the condemned batches to triage);
    *  2. [[graft.operators.Retraction.retractDocs]] for the rejected
    *     batches' doc ids — every committed trace (corpus rows, label
    *     edges, index/sidecar rows) is excised; batches that never
    *     committed anything cost a few no-op anti-joins;
    *  3. one ledger row per rejected batch (append-only, like the
    *     funnel: re-runs may duplicate rows, `rejected_ts` dedupes);
    *  4. surviving batches rejoin the live queue; the claim is removed.
    *
    * Retraction runs FIRST so a crash anywhere leaves the rejected
    * batches still claimed and the re-run re-heals (retraction is
    * idempotent — exactly-once stats via the text index's retraction
    * ledger, [[graft.sources.TextIndex.retract]]). Crash windows, both
    * append-side and both swallowed downstream: (a) a crash between the
    * LEDGER append and the claim removal re-appends the ledger row on
    * re-run — `rejected_ts` dedupes readers; (b) a crash between the
    * KEPT-batch re-append and the claim removal makes the recovery
    * re-run append the surviving queue rows AGAIN — the duplicated
    * quarantine rows are re-triaged like any queue content and the
    * corpus loop's exact-key gate swallows them at release (a held
    * batch can be duplicated in the queue, never double-admitted; the
    * same trade [[reprocessQuarantine]] documents for its own claimed-
    * dir cleanup). Scope, stated plainly:
    * retraction is BY DOC ID — if a rejected batch re-delivered the id
    * of a legitimately admitted document, that document is retracted
    * too (ids are the corpus identity; a quarantined re-delivery of a
    * GOOD doc is a release case, not a reject case).
    *
    * `lazily = true` swaps the synchronous excision for the tombstone
    * overlay ([[graft.operators.Retraction.tombstoneDocs]]): the
    * rejected residue becomes unservable in O(ids) writes and the
    * rejection returns immediately; the physical excision (including
    * the corpus rows) is [[graft.operators.Retraction.applyTombstones]]
    * on the compaction cadence. Requires ≥ 1 overlay-carrying artifact
    * in `artifacts` (the eager path has no such constraint).
    */
  def rejectQuarantined(spark: SparkSession, quarantinePath: String,
                        rejectIds: Seq[Long],
                        artifacts: graft.operators.Retraction.Artifacts,
                        ledgerPath: Option[String] = None,
                        lazily: Boolean = false): RejectResult = {
    require(rejectIds.nonEmpty, "rejectQuarantined needs batch ids")
    val qDir = new java.io.File(quarantinePath)
    val claimed = graft.sources.Compaction.stagingDir(qDir, "triage")
    def hasParquet(dir: java.io.File): Boolean =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .exists(f => f.isFile && f.getName.endsWith(".parquet"))
    if (claimed.exists() && !hasParquet(claimed))
      graft.sources.Compaction.rm(claimed)
    if (!claimed.exists()) {
      if (!qDir.exists()) return RejectResult(0L, 0L)
      if (!qDir.renameTo(claimed))
        throw new java.io.IOException(s"cannot claim $quarantinePath")
      if (!hasParquet(claimed)) {
        graft.sources.Compaction.rm(claimed)
        return RejectResult(0L, 0L)
      }
    }
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(claimed.toString)
    val queue = (if (raw.columns.contains("__q_batch"))
        raw.withColumn("__q_batch", coalesce(col("__q_batch"), lit(-1L)))
      else raw.withColumn("__q_batch", lit(-1L)))
      .localCheckpoint(true)
    try {
      val rejected = queue.where(col("__q_batch").isin(rejectIds: _*))
      val perBatch = rejected
        .groupBy("__q_batch")
        .agg(count(lit(1)).as("n_docs"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // nothing matched → skip the (whole-table-rewriting) retraction;
      // the queue flows back through the same append-and-drop-claim path
      // as the kept batches (a rename restore could collide with rows
      // the live stream quarantined since the claim)
      val requested = if (perBatch.isEmpty) 0L else {
        val docIds = rejected
          .select(col(artifacts.idCol).cast("long").as(artifacts.idCol))
          .distinct()
        val report =
          if (lazily) graft.operators.Retraction.tombstoneDocs(spark,
            docIds, artifacts.idCol, artifacts)
          else graft.operators.Retraction.retractDocs(spark, docIds,
            artifacts.idCol, artifacts)
        ledgerPath.foreach { lp =>
          import spark.implicits._
          val ts = System.currentTimeMillis()
          perBatch.toSeq.map { case (bid, n) => (bid, n, ts) }
            .toDF("batch_id", "n_docs", "rejected_ts")
            .coalesce(1).write.mode("append").parquet(lp)
        }
        report.requested
      }
      val kept = queue.where(!col("__q_batch").isin(rejectIds: _*))
      if (!kept.isEmpty)
        kept.write.mode("append").parquet(quarantinePath)
      graft.sources.Compaction.rm(claimed)
      RejectResult(perBatch.length.toLong, requested)
    } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(queue)
  }

  /** Outcome of a [[reprocessQuarantine]] attempt: quarantined batches
    * triaged this invocation (≤ `maxBatches`; batches beyond the bound
    * wait in the queue uncounted), batches that cleared the updated
    * reference and flowed the gate chain, and how many docs actually
    * landed (released minus gate failures minus already-present dups).
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
    * Queue maintenance is CLAIM-based so triage is safe to run while the
    * stream is live: the first act is an atomic rename of the queue
    * directory to a dot-prefixed `__triage` sibling — from that moment
    * the stream's quarantine writes land in a fresh `quarantinePath`
    * this invocation never touches again (the old read-process-then-
    * delete order could destroy a batch the stream quarantined mid-
    * triage). Still-held batches are appended BACK to the live queue at
    * the end; the claimed dir is then removed. A leftover claimed dir
    * (crash mid-triage) is recovered FIRST on the next invocation, before
    * any new claim, and re-admission stays exactly-once through the
    * dedup gate — a crash between the held-batch re-append and the
    * claimed-dir cleanup can at worst duplicate a held batch in the
    * queue, where the gate drops it on eventual release. (A stream
    * micro-batch that commits its quarantine write in the instant of the
    * claim rename fails loudly and is replayed from the checkpoint —
    * never silently lost.) A claimed dir that holds no parquet files —
    * a crash mid-removal after the data files were deleted, or a claim
    * of an empty-but-existing queue dir — is garbage, not a snapshot:
    * it is removed up front (reading it would throw "unable to infer
    * schema" on every invocation forever, wedging triage). Per-batch
    * divergence rows append to `metricsPath` with `batch_id = -1`
    * marking them as triage (not live-stream) measurements.
    *
    * The queue is read with `mergeSchema` because the normal upgrade
    * state is a MIXED queue: batches quarantined before the `__q_batch`
    * tag existed next to tagged ones. Schema merge surfaces the tag
    * column with nulls on the legacy rows, which fold into the `-1`
    * pre-tag batch — without the merge Spark picks one file's schema,
    * and either the tag is silently dropped (all batches pool into one
    * mixture, the exact masking the per-batch tag prevents) or the
    * legacy rows read the tag as null and the id collection NPEs with
    * the claim left behind (triage permanently stuck).
    *
    * Triage is a sequential driver loop (one divergence job + one gate
    * chain per batch id) — fine at daily cadence, but a pathological
    * backlog of thousands of quarantined micro-batches would serialize.
    * `maxBatches` bounds one invocation: the OLDEST `maxBatches` batch
    * ids are triaged, the rest are re-appended to the live queue
    * untouched (exactly like held batches), so a backlog drains across
    * invocations instead of pinning the driver, and re-admission stays
    * exactly-once throughout via the dedup gate.
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
                          indexCompactEvery: Int = 0,
                          maxBatches: Int = Int.MaxValue,
                          sketch: Option[graft.sources.SketchSidecar.Cfg] = None,
                          exactKeys: Option[graft.sources.BloomKeyIndex.Cfg] = None,
                          dupLabels: Option[String] = None,
                          corpusCompactEvery: Int = 0,
                          dupLabelsPartitions: Int = 0,
                          funnel: Option[String] = None,
                          media: Option[CorpusPipeline.MediaGate] = None,
                          textIndex: Option[graft.sources.TextIndex.Cfg] =
                            None)
      : ReprocessResult = {
    require(maxBatches > 0, "maxBatches must be positive")
    val qDir = new java.io.File(quarantinePath)
    val claimed = graft.sources.Compaction.stagingDir(qDir, "triage")
    def hasParquet(dir: java.io.File): Boolean =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .exists(f => f.isFile && f.getName.endsWith(".parquet"))
    // a parquet-less claimed dir (crash mid-removal, or a claim of an
    // empty-but-existing queue) would fail schema inference forever —
    // discard it so the live queue can be claimed
    if (claimed.exists() && !hasParquet(claimed))
      graft.sources.Compaction.rm(claimed)
    // recover a crashed prior claim first; otherwise claim the current
    // queue atomically (batches quarantined after this rename wait for
    // the next invocation)
    if (!claimed.exists()) {
      if (!qDir.exists()) return ReprocessResult(0L, 0L, 0L)
      if (!qDir.renameTo(claimed))
        throw new java.io.IOException(s"cannot claim $quarantinePath")
      if (!hasParquet(claimed)) { // claimed an empty queue dir
        graft.sources.Compaction.rm(claimed)
        return ReprocessResult(0L, 0L, 0L)
      }
    }
    // mergeSchema: a mixed legacy/tagged queue must surface __q_batch
    // with nulls on the legacy rows (see the method doc)
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(claimed.toString)
    if (raw.isEmpty) {
      graft.sources.Compaction.rm(claimed)
      return ReprocessResult(0L, 0L, 0L)
    }
    // sever lineage from the claimed files removed at the end; null-
    // tagged legacy rows fold into the -1 pre-tag batch
    val queue = (if (raw.columns.contains("__q_batch"))
        raw.withColumn("__q_batch", coalesce(col("__q_batch"), lit(-1L)))
      else raw.withColumn("__q_batch", lit(-1L)))
      .localCheckpoint(true)
    try {
      // bounded metadata: one id per quarantined micro-batch; triage at
      // most maxBatches of them, oldest-first
      val batchIds = queue.select("__q_batch").distinct()
        .collect().map(_.getLong(0)).sorted
      val triaged = batchIds.take(maxBatches)
      var admitted = 0L
      val releasedIds = triaged.filter { bid =>
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
            // a batch whose gate chain fails BEFORE its corpus append
            // (e.g. the schema-drift gate awaiting an explicit corpus
            // migration) is HELD — it rejoins the live queue like a
            // rejected batch — instead of wedging triage forever: an
            // unguarded throw would leave the claim behind and the
            // oldest-first retry would hit the same batch on every
            // invocation, never draining the healthy batches behind it.
            // Holding is safe ONLY for that pre-append window, which
            // replays cleanly; a failure between the corpus append and
            // the MinHash gate commit arrives typed as
            // [[CorpusPipeline.PostAppendFailure]] and PROPAGATES — a
            // routine silent hold-and-retry there would re-append the
            // batch's survivors as permanent duplicate corpus rows, so
            // it must stay an operator-visible crash (the claim dir is
            // left behind and recovered on the next invocation).
            try {
              admitted += CorpusPipeline.dedupAndAppend(b, corpusPath,
                indexPath, idCol, textCol, threshold, gates, benchmark,
                contaminationN, ann, lm, sq, dsir, lrq, indexCompactEvery,
                sketch, exactKeys, dupLabels, corpusCompactEvery,
                dupLabelsPartitions, funnel, media, funnelBatchId = bid,
                textIndex = textIndex)
              true
            } catch {
              case e: CorpusPipeline.PostAppendFailure => throw e
              case scala.util.control.NonFatal(e) =>
                System.err.println(
                  s"[triage] batch $bid held: gate chain failed — $e")
                false
            }
          }
        } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(m)
      }.toSet
      // held batches (triaged-but-rejected AND beyond-maxBatches) rejoin
      // the LIVE queue (append — the stream may have quarantined more
      // batches there since the claim), then the claimed snapshot is
      // removed
      if (releasedIds.size < batchIds.length)
        queue.where(!col("__q_batch").isin(releasedIds.toSeq: _*))
          .write.mode("append").parquet(quarantinePath)
      graft.sources.Compaction.rm(claimed)
      ReprocessResult(triaged.length.toLong, releasedIds.size.toLong,
        admitted)
    } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(queue)
  }
}
