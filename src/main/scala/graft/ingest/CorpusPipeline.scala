package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** End-to-end training-corpus builder: the watermark-incremental ingest of
  * [[IncrementalBatch]] composed with the index-backed near-dup gate of
  * [[Dedup.dedupAgainstIndex]] — the daily loop of a production corpus:
  *
  *   read fresh (ts > watermark) → drop docs near-duplicating the EXISTING
  *   corpus (via the MinHash index — corpus text is never re-read) → drop
  *   within-batch near-dups → append survivors to the corpus AND their
  *   signatures to the index → advance the watermark.
  *
  * First run bootstraps: no index yet, so the whole batch (self-deduped)
  * becomes the corpus and seeds the index.
  *
  * Scale notes: per batch, the only shingling is the batch's own (narrow);
  * the index join ships a few ints per doc per band; corpus growth is
  * append-only on both files. The watermark advances only after both
  * appends commit (same crash-safety ordering as [[IncrementalBatch]] —
  * B4's fix); a retry after a post-append crash re-matches the batch
  * against its own indexed rows and drops it as duplicate instead of
  * double-appending.
  */
class CorpusPipeline(
    spark: SparkSession,
    sourcePath: String,
    corpusPath: String,
    indexPath: String,
    watermarkPath: String,
    tsCol: String = "ts",
    idCol: String = "doc_id",
    textCol: String = "text",
    threshold: Double = 0.8) {

  private def indexExists: Boolean =
    new java.io.File(s"$indexPath/meta").exists()

  /** Run one batch; returns (docs appended, new watermark). */
  def run(): BatchResult = {
    val src = spark.read.parquet(sourcePath)
    val wm = Watermark.read(watermarkPath)
    val fresh = wm match {
      case Some(ts) =>
        src.filter(col(tsCol) > lit(ts).cast(src.schema(tsCol).dataType))
      case None => src
    }
    if (fresh.limit(1).isEmpty) return BatchResult(0L, wm)
    val maxTs = fresh.agg(max(col(tsCol))).collect().head.get(0)

    // gate 1: docs near-duplicating the EXISTING corpus (index join only)
    val vsCorpus =
      if (!indexExists) fresh
      else {
        val dupIds = Dedup
          .dedupAgainstIndex(fresh, idCol, textCol, indexPath, threshold)
          .select(col("new_id").as(idCol)).distinct()
        fresh.join(dupIds, Seq(idCol), "left_anti")
      }
    // gate 2: within-batch near-dups (batch-local LSH; batches are small
    // next to the corpus, so the lazy non-persisted form is right here)
    val survivors = Dedup.dropNearDuplicates(vsCorpus, idCol, textCol,
      threshold = threshold, persistIntermediates = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val appended = survivors.count()
      if (appended > 0) {
        survivors.write.mode("append").parquet(corpusPath)
        if (indexExists)
          Dedup.appendMinhashIndex(survivors, idCol, textCol, indexPath)
        else
          Dedup.writeMinhashIndex(survivors, idCol, textCol, indexPath)
      }
      // watermark covers the WHOLE fresh batch (dropped dups were
      // processed — reprocessing them forever would be the bug), and only
      // moves after the appends committed
      Watermark.write(watermarkPath, maxTs.toString)
      BatchResult(appended, Some(maxTs.toString))
    } finally survivors.unpersist(false)
  }
}
