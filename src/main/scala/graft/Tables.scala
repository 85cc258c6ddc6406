package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All timestamps are kept as TIMESTAMP_NTZ end-to-end: the source parquet
  * stores naive (isAdjustedToUTC=false) timestamps, Spark 4 infers them as
  * NTZ, and keeping NTZ means our *output* parquet is also naive — which is
  * what the DuckDB oracle computes from the same files. Session timezone is
  * UTC everywhere so NTZ/instant semantics coincide.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS,false), which Spark's parquet
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos
    * via the legacy conf — `ts` stays a long here so predicates on it remain
    * plain column comparisons that push down to parquet row-group stats.
    */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // set-if-needed: avoids re-mutating shared session conf on every load
    // (benign for this conf but noisy/racy in concurrent sessions)
    if (!spark.conf.getOption(key).contains("true"))
      spark.conf.set(key, "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** ns → TIMESTAMP_NTZ truncated to microseconds — the same truncation
    * DuckDB applies reading nanosecond parquet into its microsecond
    * TIMESTAMP. Filter on the raw nanos (see [[eventsRaw]]) BEFORE this
    * conversion when the predicate should reach the scan: a filter on the
    * converted column degrades to a post-scan filter (full scan at 100 TB).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsRaw(spark, sfDir)
      .withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
}
