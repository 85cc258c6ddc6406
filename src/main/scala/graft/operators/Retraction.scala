package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TAKEDOWN / retraction — the lifecycle verb the append-only corpus was
  * missing: excise a set of documents from the corpus AND every derived
  * serving artifact, so the first GDPR request, license revocation, or
  * poisoned-batch rollback is an operator call, not an incident.
  *
  * The reference's storage is a mutable Postgres table, where this is one
  * `DELETE` (`/root/reference/script.sql:1-4` shows the in-place-mutation
  * idiom — the daily job UPDATEs rows in place). A 100 TB parquet corpus
  * has no in-place mutation, and worse, it fans out into derived state —
  * text postings, MinHash signatures, hash indexes, ANN code tables, key
  * tables, provenance labels — each of which would keep SERVING the
  * retracted document forever if only the corpus row disappeared. So the
  * verb is a fan-out of artifact-local excisions, each owned by the
  * artifact's module (the module that knows the layout owns the pruned
  * rewrite):
  *
  *  - text postings  → [[graft.sources.TextIndex.retract]] — anti-join
  *    pruned to the docs' terms' `tp=` partitions + a compensating
  *    NEGATIVE stats row (the stats schema is additive; history is never
  *    rewritten);
  *  - MinHash index  → [[Dedup.retractFromMinhashIndex]] — one O(index)
  *    ints-only rewrite (band hashes have no doc locality);
  *  - exact-key gate → [[graft.sources.BloomKeyIndex.retractKeys]] —
  *    keys table pruned to the keys' `kp=` partitions; the bloom keeps a
  *    stale positive that the exact-confirm join resolves, which is
  *    precisely the re-admission contract;
  *  - ANN code/data  → [[Similarity.retractFromIndex]] — cell-pruned
  *    rewrite (≤ nlist touched leaves), geometry sidecars untouched;
  *  - SQ8 index      → [[Sq.retractFromSqIndex]];
  *  - media/audio    → [[Multimodal.retractFromMediaIndex]];
  *  - label store    → [[Components.retractFromLabelStore]] — re-closure
  *    over the survivor star edges;
  *  - corpus         → one anti-join rewrite, LAST (see ordering below).
  *
  * Artifacts NOT excised, by design:
  *  - sketch sidecars (HLL/KMV/CMS/quantiles) are one-way additive —
  *    they cannot subtract a member. The stance: monitoring sketches
  *    describe what WAS ingested (a ledger, like the funnel), and a
  *    deployment that must forget even sketch-level membership evidence
  *    either re-derives the sidecar from the surviving corpus (one scan,
  *    the [[graft.sources.TextIndex.healStats]] shape) or segments
  *    sidecars by ingest EPOCH and drops whole epochs —
  *    [[graft.sources.SketchSidecar.retractGroups]] makes the epoch
  *    path an operator (exact: the surviving rows ARE the surviving
  *    epochs' state). The one additive face with exact inverse — the
  *    moments face — could take a negative row, but a half-forgetting
  *    sidecar is worse than a documented one.
  *  - the SCD2 store closes rather than deletes
  *    ([[Merge.scd2CloseStored]] — dimension keys, not doc ids, so it is
  *    not in [[Artifacts]]);
  *  - the funnel log is an execution ledger, kept.
  *
  * ORDERING — derived artifacts first, corpus LAST. The text-index
  * excision prunes by re-tokenizing the docs' text, and the bloom-key
  * excision recomputes their keys, so the corpus row must still exist
  * when they run; putting the corpus rewrite last also makes the whole
  * verb re-runnable: a crash anywhere before it leaves the docs readable,
  * and every artifact excision is an anti-join (absent ids are a no-op).
  * The one non-idempotent residue is the text index's `n_docs`
  * compensation (documented + healable at
  * [[graft.sources.TextIndex.retract]]). After the corpus rewrite
  * commits, a re-run finds zero docs and does nothing.
  *
  * Scale shape: every derived-artifact rewrite is partition-pruned or
  * O(index-ints). The corpus rewrite is O(corpus) for a FLAT corpus —
  * batch takedown requests and apply them on a cadence (the verb takes
  * a SET) — and touched-partition-only when the corpus is partitioned:
  * set [[Artifacts.corpusPartitionCol]] (e.g. an ingest-date column)
  * and the rewrite finds the docs' partition values from their own rows
  * (bounded by the takedown set) and swaps ONLY those leaves, untouched
  * dates byte-identical (spec-asserted) — the 100 TB layout answer. The
  * layouts here model the compute; a manifest-committing table format
  * supplies the atomic multi-file swap on object stores.
  *
  * Tombstone ≠ ban, stated as a contract: after retraction the engine
  * holds NO memory of the document in any gate, so a re-submitted copy
  * re-admits through the corpus loop like any novel document
  * (spec-proven in `RetractionSpec`). A deployment that wants a BLOCK
  * list should gate on it explicitly — forgetting and banning are
  * different verbs.
  */
object Retraction {

  /** The artifact set a corpus deployment maintains — mirror of the
    * [[graft.ingest.CorpusPipeline.dedupAndAppend]] sidecar options, so
    * a loop's configuration maps 1:1 onto its takedown configuration.
    */
  /** `corpusPartitionCol`: set when the corpus is `partitionBy`-written
    * on this column (the date-partitioned 100 TB layout) — the corpus
    * rewrite then prunes to the partitions the retracted docs live in.
    * Values must be directory-safe (dates, small ints — the usual
    * partition-value discipline). None = flat corpus, whole-table
    * rewrite.
    */
  case class Artifacts(
      corpusPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      corpusPartitionCol: Option[String] = None,
      minhashIndexPath: Option[String] = None,
      textIndex: Option[graft.sources.TextIndex.Cfg] = None,
      exactKeys: Option[graft.sources.BloomKeyIndex.Cfg] = None,
      annIndexPath: Option[String] = None,
      annIdCol: String = "doc_id",
      sqIndexPath: Option[String] = None,
      sqIdCol: String = "doc_id",
      mediaIndexPath: Option[String] = None,
      dupLabelsPath: Option[String] = None)

  /** @param requested distinct ids asked for
    * @param found     of those, ids present in the corpus this run (0 on
    *                  a clean re-run — the verb already completed)
    */
  case class Report(requested: Long, found: Long)

  /** RETROACTIVE decontamination — the composition the positional text
    * index and the takedown verb exist to enable: when the eval
    * benchmark GROWS (new benchmark version, new held-out set), docs
    * already admitted under the old contamination gate may verbatim-
    * contain the new phrases. Membership comes from |phrases| pruned
    * `tp=` index reads ([[graft.sources.TextIndex.phraseMembers]] —
    * never a corpus text re-scan), and the hits flow through
    * [[retractDocs]] so every serving artifact forgets them in the same
    * call. Requires `a.textIndex` and a positional layout (the members
    * serve refuses a bare index loudly).
    */
  def retractMatchingPhrases(spark: SparkSession,
                             phrases: Seq[Seq[String]],
                             a: Artifacts): Report = {
    val cfg = a.textIndex.getOrElse(throw new IllegalArgumentException(
      "retractMatchingPhrases needs Artifacts.textIndex (positional) — " +
        "phrase membership is served from the index"))
    val hits = graft.sources.TextIndex.phraseMembers(spark, cfg, a.idCol,
      phrases)
    if (hits.isEmpty) Report(0L, 0L) // clean corpus — touch nothing
    else retractDocs(spark, hits, a.idCol, a)
  }

  /** Excise `ids` from every configured artifact, then from the corpus.
    * Safe to re-run (see ordering contract above).
    */
  def retractDocs(spark: SparkSession, ids: DataFrame, idsCol: String,
                  a: Artifacts): Report = {
    val keys = ids.select(col(idsCol).cast("long").as("__rid")).distinct()
      .localCheckpoint(true)
    try {
      val requested = keys.count()
      // a deployment with no corpus yet (e.g. a quarantined batch
      // rejected before ANY admission) has nothing to excise anywhere —
      // every artifact is born with its first corpus append
      if (!new java.io.File(a.corpusPath).exists())
        return Report(requested, 0L)
      // the docs' full rows, read BEFORE any rewrite: the text-pruned and
      // key-pruned excisions derive their partition lists from them
      val corpus = spark.read.parquet(a.corpusPath)
      val docs = corpus
        .join(broadcast(keys), corpus(a.idCol).cast("long") === col("__rid"),
          "left_semi")
        .localCheckpoint(true)
      try {
        val found = docs.count()
        // found == 0 means either a completed prior run (the corpus is
        // the LAST commit point, so its absence implies every index
        // excision already committed) or ids that were never admitted —
        // in both cases the corpus-fed indexes hold nothing for them,
        // so the rewrites are skipped. The LABEL STORE is the one
        // artifact that records ids that never reached the corpus
        // (near-dups attributed to a survivor at the gate), so its
        // excision runs regardless — retracting a doc that was dropped
        // as a duplicate must still erase its provenance row.
        if (found > 0) {
          a.textIndex.foreach { cfg =>
            graft.sources.TextIndex.retract(spark, cfg, docs, a.idCol,
              a.textCol)
          }
          a.exactKeys.foreach { cfg =>
            graft.sources.BloomKeyIndex.retractKeys(docs, cfg)
          }
          a.minhashIndexPath.foreach { p =>
            Dedup.retractFromMinhashIndex(spark, p, keys, "__rid")
          }
          a.annIndexPath.foreach { p =>
            Similarity.retractFromIndex(spark, p, keys, "__rid",
              a.annIdCol)
          }
          a.sqIndexPath.foreach { p =>
            Sq.retractFromSqIndex(spark, p, keys, "__rid", a.sqIdCol)
          }
          a.mediaIndexPath.foreach { p =>
            Multimodal.retractFromMediaIndex(spark, p, keys, "__rid")
          }
        }
        a.dupLabelsPath.foreach { p =>
          Components.retractFromLabelStore(spark, p, keys, "__rid")
        }
        // corpus LAST — the commit point after which a re-run is a no-op
        if (found > 0) a.corpusPartitionCol match {
          case None =>
            graft.sources.Compaction.retractRows(spark, a.corpusPath, keys,
              (t, k) => t(a.idCol).cast("long") === k("__rid"))
          case Some(pc) =>
            // touched partitions from the docs' own rows — bounded by
            // the takedown set; only those leaves rewrite
            val touched = docs.select(col(pc).cast("string")).distinct()
              .collect().map(_.getString(0)).toSeq
            touched.foreach { v =>
              val leaf = new java.io.File(a.corpusPath, s"$pc=$v")
              if (leaf.exists()) {
                val staging =
                  graft.sources.Compaction.stagingDir(leaf, "retract")
                if (staging.exists()) graft.sources.Compaction.rm(staging)
                val leafDf = spark.read.parquet(leaf.toString)
                leafDf.join(broadcast(keys),
                    leafDf(a.idCol).cast("long") === keys("__rid"),
                    "left_anti")
                  .write.mode("overwrite").parquet(staging.toString)
                graft.sources.Compaction.swapInto(leaf.toString,
                  staging.toString)
              }
            }
        }
        Report(requested, found)
      } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(docs)
    } finally org.apache.spark.sql.GraftBridge.unpersistCheckpoint(keys)
  }
}
