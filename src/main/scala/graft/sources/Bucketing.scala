package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed tables: pre-shuffle data once at write time so every subsequent
  * equi-join / aggregation on the bucket key is co-located — no exchange in
  * the join plan. At 100 TB this converts the recurring O(data) shuffle of a
  * fact-fact join into a one-time cost paid when the table is laid down.
  *
  * Parquet + Hive-style bucketing via `saveAsTable` (bucket metadata lives
  * in the session catalog; files are plain parquet).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a previous session's managed-table directory can survive without a
    // catalog entry (in-memory catalog, on-disk warehouse); CREATE then
    // fails with LOCATION_ALREADY_EXISTS — clear the stale location
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two tables bucketed on `key` with matching bucket counts; with
    * bucketing enabled (default) Catalyst plans a shuffle-free sort-merge
    * join.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  // ---------------------------------------------------------------------
  // RANGE bucketing driven by sidecar bounds — the hash-bucketed family
  // above co-locates equi-joins; this lays data out by VALUE RANGE so
  // range predicates prune statically. The bounds come from the corpus
  // loop's own quantile sidecar ([[SketchSidecar.servedRangeBounds]]),
  // not from repartitionByRange's per-write sampling pass: at 100 TB the
  // sampler re-reads the data every write and its bounds drift run to
  // run, while the sidecar's equi-depth boundaries are already
  // maintained, deterministic, and balanced to the documented ledger.
  // ---------------------------------------------------------------------

  /** Bucket index of `c` under ascending `bounds`: the number of bounds
    * ≤ c — a codegen'd chain of `when` additions (bounds are few), not
    * an interpreted higher-order fold. Null values land in bucket 0
    * (every `when` is null-false), the left-most range — a policy, not
    * an error, matching where NULLS FIRST ordering would put them.
    */
  def rangeBucket(c: Column, bounds: Seq[Double]): Column = {
    require(bounds.nonEmpty && bounds == bounds.sorted,
      "bounds must be non-empty and ascending")
    bounds.foldLeft(lit(0))((acc, b) =>
      acc + when(c >= lit(b), 1).otherwise(0))
  }

  /** Write `df` partitioned by the range bucket of `colName` under
    * `bounds` — one `rb=<i>` directory per occupied bucket. Balanced by
    * the bounds' equi-depth construction; no shuffle is forced (the
    * dynamic partition writer splits each task's output by bucket), so
    * the write costs one pass over the data, exactly like the unbucketed
    * write it replaces. Installed by the staged atomic swap, not a
    * delete-then-write on the live path — a re-laid-out table that is
    * already serving must expose the old layout or the new one, never a
    * half-written directory (the [[Compaction.swapInto]] discipline
    * every rewrite in the repo follows).
    */
  def writeRangeBucketed(df: DataFrame, path: String, colName: String,
                         bounds: Seq[Double],
                         bucketCol: String = "rb"): Unit = {
    val dir = new java.io.File(path)
    val staging = Compaction.stagingDir(dir, "rangebucket")
    if (staging.exists()) Compaction.rm(staging)
    df.withColumn(bucketCol,
        rangeBucket(col(colName).cast("double"), bounds))
      .write.mode("overwrite").partitionBy(bucketCol)
      .parquet(staging.toString)
    Compaction.swapInto(path, staging.toString)
  }

  /** Range read over a [[writeRangeBucketed]] table: the value predicate
    * `lo ≤ colName ≤ hi` is composed with the DERIVED bucket predicate
    * (both endpoints' buckets computed driver-side from the same bounds
    * — literals, so the scan prunes partitions statically and pushes the
    * value filter into the remaining files). Correctness never depends
    * on the bounds: the value predicate alone decides membership.
    */
  def readRange(spark: SparkSession, path: String, colName: String,
                bounds: Seq[Double], lo: Double, hi: Double,
                bucketCol: String = "rb"): DataFrame = {
    require(lo <= hi, s"lo=$lo > hi=$hi")
    val bLo = bounds.count(_ <= lo)
    val bHi = bounds.count(_ <= hi)
    spark.read.parquet(path)
      .where(col(bucketCol).between(bLo, bHi))
      .where(col(colName) >= lo && col(colName) <= hi)
  }
}
