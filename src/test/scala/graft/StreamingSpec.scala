package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite with SparkFixture {

  test("AvailableNow pass over events: windowed rollup lands in sink; " +
      "second pass is a checkpointed no-op") {
    val dir = Files.createTempDirectory("stream")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val sink = dir.resolve("sink").toString
    val chk = dir.resolve("chk").toString

    EventsStream.runOnce(spark, src.toString, sink, chk)
    val out = spark.read.parquet(sink)
    val n1 = out.count()
    assert(n1 > 0)
    assert(out.columns.toSet === Set("window_start", "event_type",
      "n_events", "sum_value", "approx_users"))

    // second AvailableNow run with no new files: checkpoint ⇒ nothing new
    EventsStream.runOnce(spark, src.toString, sink, chk)
    assert(spark.read.parquet(sink).count() === n1)
  }
}
