package graft

import org.scalatest.funsuite.AnyFunSuite

/** Non-parquet source formats: the engine's readers are format-agnostic
  * DataFrameReader plumbing, but the devil is in the escaping — this pins
  * lossless round-trips for JSONL and CSV against the parquet ground truth,
  * including multi-script text (the documents fixture carries CJK and
  * Vietnamese), so a user switching an upstream feed from parquet to
  * JSON/CSV keeps byte-identical documents.
  */
class SourcesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def truth = Tables.load(spark, sf, "documents")
    .select("doc_id", "text", "lang")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, String)].collect().toSet

  test("JSONL round-trips the documents table losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("src_jsonl").toString
    truth.write.mode("overwrite").json(dir)
    val back = spark.read.schema(truth.schema).json(dir)
    assert(asSet(back) === asSet(truth))
  }

  test("CSV round-trips the documents table with explicit quoting options") {
    val dir = java.nio.file.Files.createTempDirectory("src_csv").toString
    // quoteAll + backslash-free escaping ("" doubling) + multiLine on the
    // read side: the combination that survives embedded quotes, commas,
    // and newlines in free text
    truth.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .csv(dir)
    val back = spark.read.schema(truth.schema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(dir)
    assert(asSet(back) === asSet(truth))
  }

  test("JDBC sink + partitioned source round-trip embedded Derby " +
      "losslessly (strings, timestamps, doubles)") {
    import org.apache.spark.sql.functions._
    val url = sources.Jdbc.derbyUrl("spec_" + System.nanoTime())
    val ev = Tables.load(spark, sf, "events")
      .filter(pmod(col("event_id"), lit(11)) === 0)
      .select("event_id", "ts", "user_id", "event_type", "value")
    sources.Jdbc.write(ev, url, "spec_events")
    val b = ev.agg(min("event_id"), max("event_id")).head
    val back = sources.Jdbc.readPartitioned(spark, url, "spec_events",
      "event_id", b.getLong(0), b.getLong(1) + 1, numPartitions = 3)
    // parallel read really splits: one JDBC part per stride
    assert(back.rdd.getNumPartitions === 3)
    assert(back.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value"))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.as[(Long, java.sql.Timestamp, Long, String, Double)].collect().toSet
    assert(key(back) === key(ev))
  }

  test("JDBC overwrite replaces prior contents (idempotent re-run)") {
    import org.apache.spark.sql.functions._
    val url = sources.Jdbc.derbyUrl("spec_ow_" + System.nanoTime())
    val one = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    sources.Jdbc.write(one, url, "spec_ow")
    sources.Jdbc.write(one.withColumn("v", upper(col("v"))), url, "spec_ow")
    val back = sources.Jdbc.read(spark, url, "spec_ow")
    assert(back.as[(Long, String)].collect().toSet === Set((1L, "A"), (2L, "B")))
  }

  test("range-bucketed layout: balanced rb= partitions from explicit " +
      "bounds, statically pruned range reads, nulls in bucket 0, " +
      "misordered bounds fail loudly") {
    import org.apache.spark.sql.functions._
    import graft.sources.Bucketing
    val dir = java.nio.file.Files.createTempDirectory("range_bucketed")
    val tab = dir.resolve("t").toString
    // 0..999 with 3 nulls; bounds at the exact quartiles
    val df = ((0 until 1000).map(i => (i.toLong, Some(i.toDouble))) ++
        Seq((2000L, None), (2001L, None), (2002L, None)))
      .toDF("id", "v")
    val bounds = Seq(250.0, 500.0, 750.0)
    Bucketing.writeRangeBucketed(df, tab, "v", bounds)
    val byBucket = spark.read.parquet(tab).groupBy("rb")
      .agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().toMap
    assert(byBucket === Map(0 -> 253L, 1 -> 250L, 2 -> 250L, 3 -> 250L),
      s"quartile bounds must balance the buckets (nulls ride bucket 0): " +
        s"$byBucket")
    // the range read: statically pruned to the two covering partitions,
    // value-exact regardless of the layout
    val read = Bucketing.readRange(spark, tab, "v", bounds, 300.0, 600.0)
    val plan = read.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*rb".r.findFirstIn(plan).nonEmpty,
      s"range read must prune on rb:\n$plan")
    assert(read.select("id").as[Long].collect().sorted.toSeq ===
      (300L to 600L))
    // nulls never leak into a range read (null >= lo is never true)
    assert(Bucketing.readRange(spark, tab, "v", bounds, 0.0, 5000.0)
      .count() === 1000L)
    intercept[IllegalArgumentException] {
      Bucketing.rangeBucket(col("v"), Seq(3.0, 1.0))
    }
    intercept[IllegalArgumentException] {
      Bucketing.readRange(spark, tab, "v", bounds, 10.0, 5.0)
    }
  }
}
