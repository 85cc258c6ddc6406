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

  /** `events.ts` has shipped in two physical layouts: TIMESTAMP(NANOS,
    * false) — which Spark's parquet reader rejects outright
    * ([PARQUET_TYPE_ILLEGAL]) unless the legacy conf reads it as a raw
    * nanos long — and, since the round-12 regeneration, plain
    * TIMESTAMP(MICROS, ntz), which Spark reads natively. This loader
    * handles both: the conf is set pre-read (it only affects NANOS
    * columns), and `ts` comes back as either a nanos LONG or a
    * TIMESTAMP_NTZ depending on the file. Callers branch on the dtype
    * ([[events]], `Queries.eventsAfterWatermark`); either way the column
    * is raw enough for predicates on it to push down to row-group stats.
    */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    // set-if-needed: avoids re-mutating shared session conf on every load
    // (benign for this conf but noisy/racy in concurrent sessions)
    if (!spark.conf.getOption(key).contains("true"))
      spark.conf.set(key, "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** `ts` normalized to TIMESTAMP_NTZ at microsecond precision whichever
    * layout the file has: ns-long → truncate to µs (the same truncation
    * DuckDB applies reading nanosecond parquet into its microsecond
    * TIMESTAMP); µs-timestamp → as-is. When filtering the ns-long layout,
    * prefer the raw column ([[eventsRaw]]) BEFORE this conversion so the
    * predicate reaches the scan; on the µs layout a timestamp predicate
    * pushes down natively.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = eventsRaw(spark, sfDir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
}
