package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference's real final hop is a Postgres table
  * loaded with a row-at-a-time INSERT loop over a pandas DataFrame
  * (`/root/reference/src/topcv_pipeline.py:104-106`, executed daily by
  * `/root/reference/airflow/dags/topcv_flow.py:58-63`). Spark-first that
  * becomes `df.write.format("jdbc")`: each partition opens one connection
  * and streams `addBatch`/`executeBatch` inserts, so throughput scales with
  * `numPartitions` instead of being a single Python loop.
  *
  * The sandbox has no Postgres; the executable analog is embedded Derby
  * (`/opt/spark/jars/derby-*.jar`, pure-JVM, zero egress). Everything here
  * is engine-portable: swap the URL for `jdbc:postgresql://...` and the
  * same code drives the reference's actual sink — Spark picks the dialect
  * from the URL.
  *
  * 100 TB stance: an RDBMS sink is a deliberate funnel — you aggregate
  * 100 TB down and land the small result, you don't bulk-load a fact table
  * through JDBC. Hence [[write]] caps connection fan-out (`maxConnections`):
  * 1000 executors all opening sockets to one database is a DDoS, not a
  * sink. The source side reads in parallel via range predicates on a
  * numeric column ([[readPartitioned]]) — each task issues
  * `WHERE col >= lo AND col < hi`, so the database does the splitting and
  * Spark never materializes the table on one task.
  */
object Jdbc {

  /** Batched parallel JDBC sink. `maxConnections` bounds the concurrent
    * connection count (= write tasks); `batchSize` is rows per
    * `executeBatch` round-trip (the knob that killed the reference's
    * one-INSERT-per-row loop).
    *
    * Trade-off: `coalesce` (the default) fuses the cap into the FINAL
    * stage, so everything after the last shuffle — not just the inserts —
    * runs at ≤ maxConnections tasks. That is the right shape for the
    * documented aggregate-then-land funnel (the final stage is a few
    * result rows). When the frame feeding the sink is scan-heavy with no
    * shuffle in between, set `repartitionBeforeWrite = true`: the extra
    * exchange decouples upstream parallelism from the connection cap.
    */
  def write(df: DataFrame, url: String, table: String,
            mode: SaveMode = SaveMode.Overwrite,
            batchSize: Int = 1000, maxConnections: Int = 4,
            repartitionBeforeWrite: Boolean = false): Unit = {
    // coalesce never raises a partition count, so the cap needs no guard
    // (a guard via df.rdd would force physical planning just to look)
    val capped = if (repartitionBeforeWrite) df.repartition(maxConnections)
                 else df.coalesce(maxConnections)
    capped.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .option("isolationLevel", "READ_COMMITTED")
      .mode(mode)
      .save()
  }

  /** Single-task read — for dimension-sized tables only. */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).load()

  /** Parallel range-partitioned read: `numPartitions` tasks each scan
    * `[lower, upper)` strides of `partitionColumn` via pushed-down range
    * predicates. Bounds are caller-supplied (one cheap `min/max` query or
    * known metadata) — never collected from the full table.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Embedded-Derby URL for a database directory under java.io.tmpdir,
    * keyed by `tag` so concurrent suites/SFs don't share a lock file.
    * (Derby allows one booting JVM per database directory.)
    */
  def derbyUrl(tag: String): String = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_derby_" + tag.replaceAll("[^A-Za-z0-9]", "_"))
    s"jdbc:derby:${dir.getAbsolutePath};create=true"
  }
}
