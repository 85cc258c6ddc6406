package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{IncrementalBatch, Watermark}

/** Integration test of the watermark incremental pipeline (SURVEY.md §5.2.4):
  * run 1 ingests everything, run 2 is a no-op (C3), run 3 picks up only new
  * rows (C2), watermark always equals max(ts) of the sink (A3 — fixes B4).
  */
class IngestSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("watermark sidecar read/write round-trip + fail-open") {
    val p = Files.createTempDirectory("wm").resolve("wm.json").toString
    assert(Watermark.read(p) === None) // missing file → fail-open
    Watermark.write(p, "2024-01-15 00:00:00")
    assert(Watermark.read(p) === Some("2024-01-15 00:00:00"))
  }

  test("idempotent sink: retry after a failed watermark commit does not " +
      "duplicate rows") {
    val dir = Files.createTempDirectory("ingest_idem")
    val src = dir.resolve("src").toString
    val sink = dir.resolve("sink").toString
    val wm = dir.resolve("wm.json").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
        (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "b"))
      .toDF("id", "ts", "name").write.parquet(src)

    def pipeline = new IncrementalBatch(spark, src, sink, wm, "ts",
      identity, idempotentSink = true)
    assert(pipeline.run().rowsWritten === 2)
    // simulate: sink committed but the watermark commit was lost
    Files.delete(java.nio.file.Paths.get(wm))
    assert(pipeline.run().rowsWritten === 2) // reprocesses the same batch
    // dynamic partition overwrite replaced the batch partition — no dupes
    assert(spark.read.parquet(sink).count() === 2)
  }

  test("incremental batch: full load, no-op, delta") {
    val dir = Files.createTempDirectory("ingest")
    val src = dir.resolve("src").toString
    val sink = dir.resolve("sink").toString
    val wm = dir.resolve("wm.json").toString

    def mkBatch(ids: Seq[Long]): Unit =
      ids.map(i => (i, java.sql.Timestamp.valueOf(f"2024-01-$i%02d 00:00:00"), s"e$i"))
        .toDF("id", "ts", "name").write.mode("append").parquet(src)

    def pipeline = new IncrementalBatch(spark, src, sink, wm, "ts",
      df => df.withColumn("name_clean", upper(col("name"))))

    mkBatch(Seq(1L, 2L, 3L))
    val r1 = pipeline.run()
    assert(r1.rowsWritten === 3)
    assert(spark.read.parquet(sink).count() === 3)
    assert(Watermark.read(wm).get.startsWith("2024-01-03"))

    val r2 = pipeline.run() // same input → empty batch short-circuit (C3)
    assert(r2.rowsWritten === 0)
    assert(spark.read.parquet(sink).count() === 3)

    mkBatch(Seq(2L, 5L)) // id=2 is older than watermark → skipped
    val r3 = pipeline.run()
    assert(r3.rowsWritten === 1)
    val out = spark.read.parquet(sink)
    assert(out.count() === 4)
    assert(out.select("name_clean").as[String].collect().toSet ===
      Set("E1", "E2", "E3", "E5"))
    assert(Watermark.read(wm).get.startsWith("2024-01-05"))
  }

  test("schema evolution: a widened source batch flows through with mergeSchema") {
    val dir = Files.createTempDirectory("ingest_evolve")
    val src = dir.resolve("src").toString
    val sink = dir.resolve("sink").toString
    val wm = dir.resolve("wm.json").toString
    def pipeline = new IncrementalBatch(spark, src, sink, wm, "ts",
      readOptions = Map("mergeSchema" -> "true"))

    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "e1"))
      .toDF("id", "ts", "name").write.mode("append").parquet(src)
    assert(pipeline.run().rowsWritten === 1)

    // the next batch gains a column — it must land, and the pre-widening
    // sink rows must read back as null in it
    Seq((2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "e2", 9.5))
      .toDF("id", "ts", "name", "score").write.mode("append").parquet(src)
    assert(pipeline.run().rowsWritten === 1)

    val out = spark.read.option("mergeSchema", "true").parquet(sink)
    assert(out.columns.toSet === Set("id", "ts", "name", "score"))
    val scores = out.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(scores === Map(1L -> None, 2L -> Some(9.5)))
  }

  test("ignoreCorruptFiles: a garbage file in the source doesn't kill the batch") {
    val dir = Files.createTempDirectory("ingest_corrupt")
    val src = dir.resolve("src")
    val sink = dir.resolve("sink").toString
    val wm = dir.resolve("wm.json").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "e1"),
        (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "e2"))
      .toDF("id", "ts", "name").write.mode("append").parquet(src.toString)
    // a truncated/garbage file alongside the real ones — the standard
    // "upstream writer died mid-file" failure
    Files.write(src.resolve("part-corrupt.parquet"),
      "this is not a parquet file".getBytes)

    val pipeline = new IncrementalBatch(spark, src.toString, sink, wm, "ts",
      readOptions = Map("ignoreCorruptFiles" -> "true"))
    val r = pipeline.run()
    assert(r.rowsWritten === 2)
    assert(spark.read.parquet(sink).count() === 2)
    assert(Watermark.read(wm).get.startsWith("2024-01-02"))
  }

  test("transform that filters out every fresh row still advances the watermark") {
    // the exact regression the pre-transform probe fixed: processed-but-
    // filtered rows must advance the watermark, or they are re-scanned on
    // every subsequent run until unrelated new data arrives
    val dir = Files.createTempDirectory("ingest_dropall")
    val src = dir.resolve("src").toString
    val sink = dir.resolve("sink").toString
    val wm = dir.resolve("wm.json").toString

    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "e1"),
        (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), "e2"))
      .toDF("id", "ts", "name").write.mode("append").parquet(src)

    def pipeline = new IncrementalBatch(spark, src, sink, wm, "ts",
      df => df.filter(col("name") === "no_such_row"))

    val r1 = pipeline.run()
    assert(r1.rowsWritten === 0)
    assert(Watermark.read(wm).get.startsWith("2024-01-02"))

    // second run: nothing fresh above the advanced watermark → C3
    // short-circuit, watermark unchanged (NOT a rescan of the dropped rows)
    val r2 = pipeline.run()
    assert(r2.rowsWritten === 0)
    assert(Watermark.read(wm).get.startsWith("2024-01-02"))
  }
}
