package graft.sources

import java.io.File
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the routine maintenance pass every append-heavy
  * table needs (ingest batches, streaming sinks, corpus appends all
  * accumulate files). Many small files are the silent scan-throughput
  * killer at 100 TB: per-file open/footer cost dominates, row groups are
  * too small for min-max stats to prune anything, and task scheduling
  * overhead swamps the actual read.
  *
  * The rewrite is `coalesce`, NOT `repartition`: no shuffle — co-located
  * splits merge on read — and existing file-internal sort order (e.g. a
  * [[ZOrder]] clustering) is concatenated, not destroyed. The swap is
  * rename-based, which is atomic on a real filesystem; object stores want
  * a manifest-commit (Delta/Iceberg) instead — this models the compute
  * side of that operation.
  */
object Compaction {

  private def parquetFiles(dir: File): Array[File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Compact `path` to roughly `targetBytes`-sized files.
    * Returns (files before, files after).
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0)
    val dir = new File(path)
    val before = parquetFiles(dir)
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(_.length()).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new File(dir.getParentFile, dir.getName + "__compacting")
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    val retired = new File(dir.getParentFile, dir.getName + "__retired")
    if (!dir.renameTo(retired))
      throw new java.io.IOException(s"cannot retire $path")
    if (!tmp.renameTo(dir)) {
      retired.renameTo(dir) // roll back — the original data wins
      throw new java.io.IOException(s"cannot swap compacted files into $path")
    }
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(retired)
    (before.length, parquetFiles(dir).length)
  }
}
