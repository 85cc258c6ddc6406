package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite with SparkFixture {

  test("stateful sessionization keeps the open session in state across " +
      "micro-batches (MemoryStream)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulSessions
    import StatefulSessions.Event
    import java.time.LocalDateTime

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    def ev(id: Long, minute: Int) =
      Event(7L, id, LocalDateTime.parse(f"2024-01-01T10:$minute%02d:00"), 1.0)

    val q = StatefulSessions.sessionize(stream.toDS(), gapSeconds = 1800,
        emitOpen = false)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()
    try {
      // batch 1: two events 5 min apart — same session, stays OPEN in state
      stream.addData(ev(1, 0), ev(2, 5))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0)
      // batch 2: an event 31+ min later closes session 1 and opens session 2
      stream.addData(ev(3, 50))
      q.processAllAvailable()
      val closed = spark.table("sessions_out")
        .as[StatefulSessions.SessionOut].collect().toSeq
      assert(closed.map(s => (s.session_id, s.n_events, s.duration_us)) ===
        Seq((1L, 2L, 300000000L)))
    } finally q.stop()
  }

  test("event-time timeout closes idle sessions when the watermark passes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulSessions
    import StatefulSessions.Event
    import java.time.LocalDateTime

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StatefulSessions.StreamEvent]
    def ev(user: Long, id: Long, time: String) =
      StatefulSessions.StreamEvent(user, id,
        java.sql.Timestamp.valueOf(time.replace('T', ' ')), 1.0)

    val q = StatefulSessions.sessionizeStreaming(stream.toDS(),
        gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("timeout_sessions")
      .start()
    try {
      // user 7's session ends at 10:05; nothing else happens for user 7
      stream.addData(ev(7L, 1L, "2024-01-01T10:00:00"),
        ev(7L, 2L, "2024-01-01T10:05:00"))
      q.processAllAvailable()
      assert(spark.table("timeout_sessions").count() === 0) // still open
      // a DIFFERENT user's event drives the watermark past 10:05 + gap —
      // user 7's session must close with NO further user-7 event
      // (one batch advances the watermark, the next applies the timeout)
      stream.addData(ev(8L, 3L, "2024-01-01T11:00:00"))
      q.processAllAvailable()
      stream.addData(ev(8L, 4L, "2024-01-01T11:01:00"))
      q.processAllAvailable()
      val closed = spark.table("timeout_sessions")
        .as[StatefulSessions.SessionOut].collect()
        .map(s => (s.user_id, s.session_id, s.n_events, s.duration_us)).toSeq
      assert(closed === Seq((7L, 1L, 2L, 300000000L)))
    } finally q.stop()
  }

  test("stateful sessionization handles one heavy user in batch mode " +
      "(documented bounded-sessions contract)") {
    import spark.implicits._
    import graft.streaming.StatefulSessions
    import StatefulSessions.Event
    import java.time.LocalDateTime
    // ONE user owning every event — the worst case for the per-group
    // buffer this operator documents (50k events ≈ the bound's spirit at
    // test scale; truly unbounded users belong to Sessionize.native)
    val t0 = LocalDateTime.parse("2024-01-01T00:00:00")
    val events = (0 until 50000).map { i =>
      val session = i / 100
      // 100 events 1 s apart per session; sessions 5000 s apart (> gap)
      Event(1L, i.toLong, t0.plusSeconds(session.toLong * 5000 + (i % 100)), 1.0)
    }
    val out = StatefulSessions.sessionize(
        spark.createDataset(events).repartition(4),
        gapSeconds = 1800, emitOpen = true)
      .collect().sortBy(_.session_id)
    assert(out.length === 500)
    assert(out.map(_.session_id).toSeq === (1L to 500L))
    assert(out.forall(s => s.n_events === 100L && s.duration_us === 99000000L))
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val events = stream.toDS().toDF("event_id", "ts")
    val q = EventsStream.dedupedEvents(events, Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      val t1 = Timestamp.valueOf("2024-01-01 10:00:00")
      stream.addData((1L, t1), (2L, t1))
      q.processAllAvailable()
      stream.addData((1L, t1), (3L, t1)) // event 1 re-delivered
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream range join equals the batch range join pair set") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ssjoin")
    val src = dir.resolve("src")
    Files.createDirectories(src)
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.purchaseAttribution(
        EventsStream.readEvents(spark, src.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("attrib_out")
      .as[(Long, Long)].collect().toSet

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(org.apache.spark.sql.functions.col("event_type")
        === "purchase")
      .select("event_id", "user_id", "ts")
    val batch = graft.operators.Joins.rangeJoin(
        ev.select("event_id", "user_id", "ts"), purchases,
        "user_id", "ts", "ts", lowerSec = 0, upperSec = 3600)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("r_event_id"))
      .as[(Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

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
