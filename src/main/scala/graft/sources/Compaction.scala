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

  /** Staging sibling for a rewrite of `dir`, named `.<name>__<suffix>`.
    * The dot prefix is load-bearing: staging/retired directories for a
    * PARTITION LEAF (`data/cell=3`) live inside the partitioned table
    * root, where Spark's partition discovery would otherwise pick up
    * `cell=3__compacting` as an extra conflicting partition — duplicated
    * rows (or a CONFLICTING_PARTITION_COLUMN_NAMES failure) for any
    * concurrent reader, or any reader after a crash left the dir behind.
    * It must be `.`, not `_`: Spark's listing filter exempts
    * `_`-prefixed names that CONTAIN `=` (they parse as partition dirs —
    * `_cell=3__compacting` is read as a `_cell` column), while
    * dot-prefixed names are unconditionally invisible.
    */
  private[graft] def stagingDir(dir: File, suffix: String): File =
    new File(dir.getParentFile, "." + dir.getName + "__" + suffix)

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
    val tmp = stagingDir(dir, "compacting")
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    swapInto(path, tmp.toString)
    (before.length, parquetFiles(dir).length)
  }

  /** Run `f` over `xs` on a bounded thread pool — the leaf-rewrite
    * parallelizer: a pruned takedown touches K independent partition
    * leaves (disjoint directories, disjoint staging), and a sequential
    * driver loop pays K full job round-trips where the cluster could
    * overlap them. Spark schedules concurrent actions from separate
    * threads fine (FIFO interleave); `parallelism` bounds the number of
    * in-flight leaf jobs so a wide takedown cannot flood the scheduler.
    * The first failure propagates after all submitted work settles —
    * every leaf rewrite in this repo is idempotent, so a failed batch
    * re-runs safely.
    */
  private[graft] def parEach[A](xs: Seq[A], parallelism: Int = 8)
                               (f: A => Unit): Unit = {
    if (xs.sizeIs <= 1) { xs.foreach(f); return }
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(parallelism, xs.size))
    try {
      val futures = xs.map { x =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = f(x)
        })
      }
      futures.foreach(_.get()) // rethrows the first failure
    } finally pool.shutdown()
  }

  /** Recursive delete, shared by every rewrite-then-replace site. */
  private[graft] def rm(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete()
  }

  /** The rename-based atomic swap: retire `path`, move `tmp` into its
    * place, delete the retired copy; roll back if the final rename fails
    * (the original data wins). Shared by [[compact]] and the index
    * maintenance passes ([[graft.operators.Similarity.reclusterIvfIndex]])
    * — any rewrite-then-replace follows this discipline. The retired copy
    * is dot-prefixed ([[stagingDir]]) so a crash between the
    * retire-rename and the cleanup leaves a dir Spark scans ignore.
    */
  def swapInto(path: String, tmp: String): Unit = {
    val dir = new File(path)
    val tmpDir = new File(tmp)
    val retired = stagingDir(dir, "retired")
    if (retired.exists()) rm(retired) // garbage from a crashed cleanup
    if (dir.exists() && !dir.renameTo(retired))
      throw new java.io.IOException(s"cannot retire $path")
    if (!tmpDir.renameTo(dir)) {
      retired.renameTo(dir) // roll back — the original data wins
      throw new java.io.IOException(s"cannot swap $tmp into $path")
    }
    rm(retired)
  }

  /** TAKEDOWN rewrite of an UNPARTITIONED parquet table: keep only the
    * rows NOT matching `keys` under `cond(table, keys)` (an anti-join —
    * keys broadcast, takedown lists are bounded), staged + atomically
    * swapped like [[compact]]. Shared by every flat-table artifact the
    * retraction path touches (MinHash index data, SQ8 data, media hash
    * indexes, the corpus itself). Idempotent: excising absent keys is a
    * no-op rewrite. A missing table is a no-op (nothing to excise).
    *
    * `readOptions` flow into the scan of the table being rewritten —
    * a caller whose table spans SCHEMA GENERATIONS (the sketch sidecar:
    * faces added over time, so older files lack newer columns) must pass
    * `mergeSchema=true` or the rewrite silently drops every column
    * absent from the footer Spark happens to infer from, destroying the
    * kept rows' state.
    */
  def retractRows(spark: SparkSession, path: String,
                  keys: org.apache.spark.sql.DataFrame,
                  cond: (org.apache.spark.sql.DataFrame,
                    org.apache.spark.sql.DataFrame) =>
                    org.apache.spark.sql.Column,
                  readOptions: Map[String, String] = Map.empty): Unit = {
    val dir = new File(path)
    if (!dir.exists()) return
    val table = spark.read.options(readOptions).parquet(path)
    val staging = stagingDir(dir, "retract")
    if (staging.exists()) rm(staging)
    table.join(org.apache.spark.sql.functions.broadcast(keys),
        cond(table, keys), "left_anti")
      .write.mode("overwrite").parquet(staging.toString)
    swapInto(path, staging.toString)
  }

  /** TAKEDOWN rewrite of the TOUCHED leaves of a partitioned table in
    * ONE Spark job: a pruned scan of exactly the `values` partitions
    * (PartitionFilters — untouched leaves are never opened), the
    * caller's `rewrite` (an anti-join at every call site), one dynamic
    * partitioned write into a root-level staging sibling, then per-leaf
    * atomic swaps — driver renames, no further jobs. Replaces the
    * read-rewrite-swap-per-leaf loop, whose cost was one Spark job PER
    * touched leaf (pure job-scheduling latency once leaves are small —
    * measured ~4 s for ~50 bloom-key leaves at bench scale); at 100 TB
    * a takedown touching thousands of leaves pays one job either way.
    * No shuffle is added: parquet scan tasks never span partition dirs,
    * so the dynamic write emits per-task-per-leaf files matching the
    * input granularity.
    *
    * A leaf the rewrite EMPTIES is swapped to a schema stub (the
    * behavior of the per-leaf loop this replaces — readers see zero
    * rows; the dir stays, so appenders and existence checks are
    * unaffected). Crash window unchanged in kind: some leaves swapped,
    * some not — every caller's verb is idempotent and re-derives its
    * worklist.
    */
  private[graft] def rewriteLeaves(spark: org.apache.spark.sql.SparkSession,
                                   root: String, partCol: String,
                                   values: Seq[Any],
                                   rewrite: org.apache.spark.sql.DataFrame =>
                                     org.apache.spark.sql.DataFrame): Unit = {
    val rootDir = new File(root)
    val live = values.filter(v => new File(rootDir, s"$partCol=$v").exists())
    if (live.isEmpty) return
    val staging = stagingDir(rootDir, "retract_batch")
    if (staging.exists()) rm(staging)
    import org.apache.spark.sql.functions.col
    // prune via the STRING face of the partition column: partition
    // filters are evaluated driver-side against the partition catalog
    // (casts included), and string-vs-native literals would otherwise
    // hit ANSI type-mismatch for callers that collect dir values as
    // strings
    val rewritten = rewrite(spark.read.parquet(root)
      .where(col(partCol).cast("string")
        .isin(live.map(_.toString): _*)))
    rewritten.write.mode("overwrite").partitionBy(partCol)
      .parquet(staging.toString)
    val dataSchema = org.apache.spark.sql.types.StructType(
      rewritten.schema.filterNot(_.name == partCol))
    parEach(live) { v =>
      val leaf = new File(rootDir, s"$partCol=$v")
      val stagedLeaf = new File(staging, s"$partCol=$v")
      if (!stagedLeaf.exists()) {
        // the rewrite emptied this leaf — dynamic writes emit no dir
        // for it, so stage the schema stub the per-leaf loop produced
        spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            dataSchema)
          .write.mode("overwrite").parquet(stagedLeaf.toString)
      }
      swapInto(leaf.toString, stagedLeaf.toString)
    }
    rm(staging)
  }

  /** What [[vacuum]] did: orphan staging/retired dirs removed (with their
    * byte sizes summed) and sole-copy `__retired` dirs HELD for manual
    * recovery (their live sibling is missing — deleting them would be the
    * data loss the swap discipline exists to prevent).
    */
  case class VacuumReport(removed: Seq[String], bytes: Long,
                          held: Seq[String])

  /** GC of crash orphans under `root`: every staged rewrite in the engine
    * goes through [[stagingDir]]'s `.name__suffix` siblings + [[swapInto]],
    * so a crash mid-rewrite leaves a dot-prefixed directory that every
    * Spark scan ignores (correctness is unaffected — that is the point of
    * the dot) but that holds disk forever and, for partition leaves, gets
    * re-created beside on every retry. This sweep makes the crash windows
    * every verb documents actually CONVERGE on disk too.
    *
    * Safety rules, each load-bearing:
    *  - only names matching `.name__suffix` are candidates — live data,
    *    `key=value` leaves, `_`-metadata and `<root>__tombstones` overlay
    *    siblings never match;
    *  - the `triage` suffix is NEVER touched: the streaming triage claims
    *    the quarantine queue BY RENAMING it to `.q__triage` (the claimed
    *    dir IS the sole copy; a crashed claim is recovered, not garbage —
    *    [[graft.streaming.CorpusStream.rejectQuarantined]]);
    *  - a `retired` dir is removed only when its live sibling EXISTS: a
    *    crash between [[swapInto]]'s retire-rename and install-rename
    *    leaves `.name__retired` as the ONLY copy of the data — those are
    *    reported in `held`, never deleted;
    *  - an age guard: a candidate whose tree was modified within
    *    `minAgeMs` is skipped — it may be a rewrite IN FLIGHT on another
    *    driver (the bounded-pool leaf rewrites run concurrently).
    *
    * The sweep covers the root's own `.root__suffix` siblings in its
    * PARENT directory too (where [[stagingDir]] places whole-root rewrite
    * staging), under the same rules and scoped to exactly this root's
    * name — and that check runs even when the root itself is missing,
    * because root-gone-with-`.root__retired`-present is precisely the
    * sole-copy crash state `held` exists to surface.
    *
    * Driver-side listing walk (no data read), the same cost class as the
    * partition discovery the maintenance pass already pays.
    */
  def vacuum(root: String, minAgeMs: Long = 24L * 3600 * 1000,
             nowMs: Long = System.currentTimeMillis()): VacuumReport = {
    val candidate = """^\.(.+)__([A-Za-z0-9]+)$""".r
    def treeBytes(f: File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(treeBytes).sum
    def newestMtime(f: File): Long = {
      val own = f.lastModified()
      if (f.isFile) own
      else (own +: Option(f.listFiles()).getOrElse(Array.empty)
        .map(newestMtime).toSeq).max
    }
    val removed = Seq.newBuilder[String]
    val held = Seq.newBuilder[String]
    var bytes = 0L
    def decide(dir: File, c: File, name: String, suffix: String): Unit = {
      val fresh = nowMs - newestMtime(c) < minAgeMs
      val soleRetired =
        suffix == "retired" && !new File(dir, name).exists()
      if (suffix == "triage" || fresh) () // never / in-flight
      else if (soleRetired) held += c.getPath
      else { bytes += treeBytes(c); removed += c.getPath; rm(c) }
    }
    def walk(dir: File): Unit = {
      val children = Option(dir.listFiles()).getOrElse(Array.empty)
      children.foreach { c =>
        c.getName match {
          case candidate(name, suffix) => decide(dir, c, name, suffix)
          case n if c.isDirectory && !n.startsWith(".") => walk(c)
          case _ => ()
        }
      }
    }
    val r = new File(root)
    if (r.exists()) walk(r)
    // the root's OWN rewrite orphans live in its PARENT ([[stagingDir]]
    // places `.corpus__compacting` BESIDE the dir being rewritten), so a
    // walk that starts inside the root never sees a whole-root compact/
    // recluster/export leftover — including the one state that must be
    // surfaced loudest: a sole-copy `.root__retired` with the root itself
    // gone (mid-[[swapInto]] crash), which is why this check runs even
    // when the root does not exist. Scoped to exactly this root's name:
    // sibling TABLES' staging dirs belong to their own vacuum call.
    Option(r.getParentFile).foreach { parent =>
      val own = ("""^\.""" + java.util.regex.Pattern.quote(r.getName) +
        """__([A-Za-z0-9]+)$""").r
      Option(parent.listFiles()).getOrElse(Array.empty).foreach { c =>
        c.getName match {
          case own(suffix) => decide(parent, c, r.getName, suffix)
          case _ => ()
        }
      }
    }
    VacuumReport(removed.result(), bytes, held.result())
  }

  /** Compact every leaf partition directory of a `partitionBy`-written
    * table (e.g. an IVF-family index's `data/cell=N/` directories) while
    * PRESERVING the partition layout — the plain [[compact]] would read
    * the whole table and write it back unpartitioned, destroying the very
    * PartitionFilters pruning the index exists for.
    *
    * This is the maintenance pass the `appendTo*Index` family needs:
    * every append lands one file-set per touched partition, so after N
    * daily batches each cell directory is an N-small-files swamp — footer
    * opens start to dominate the pruned scan the cell layout was bought
    * for. Each leaf compacts independently (per-partition [[compact]],
    * same atomic rename-swap), so a failure mid-way leaves every cell
    * either fully old or fully new — never mixed — and sidecars
    * (centroids/codebooks/params) are untouched by construction: only
    * `key=value` directories are descended into.
    *
    * Returns (files before, files after) summed over all leaves.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetBytes: Long = 128L * 1024 * 1024)
      : (Int, Int) = {
    def leaves(dir: File): Seq[File] = {
      // the prefix filter mirrors Spark's own listing rule: a crash-
      // leftover `.cell=3__compacting` staging dir contains '=' but must
      // not be treated as a live leaf (it would be re-read and re-written
      // as garbage on every maintenance pass, forever)
      val parts = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("=") &&
          !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      if (parts.isEmpty) Seq.empty
      else parts.toSeq.flatMap { p =>
        val deeper = leaves(p)
        if (deeper.isEmpty) Seq(p) else deeper
      }
    }
    val ls = leaves(new File(path))
    require(ls.nonEmpty,
      s"$path has no key=value partition directories — use compact() " +
        "for unpartitioned tables")
    val results = ls.map(l => compact(spark, l.toString, targetBytes))
    (results.map(_._1).sum, results.map(_._2).sum)
  }
}
