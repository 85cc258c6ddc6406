package graft.streaming

import java.time.{LocalDateTime, ZoneOffset}
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the operator
  * shape Structured Streaming uses for state the built-in windows can't
  * express (SURVEY.md §2.7 gap; builder brief: KeyValueGroupedDataset custom
  * state).
  *
  * Works on both batch and streaming Datasets. In batch mode each user's
  * events arrive as one group and `emitOpen=true` flushes the trailing
  * session; in streaming mode the open session stays in the state store
  * across micro-batches (pair with an event-time timeout in production).
  *
  * The batch output is exactly the lag+running-sum SQL sessionization
  * (`Queries.q_sessionize`), which is what lets the DuckDB oracle check this
  * operator end-to-end.
  *
  * MEMORY BOUND — read before running this on a whale-user dataset: batch
  * groups arrive UNSORTED, so each call buffers and sorts the user's
  * entire event list in task memory (`rows.toIndexedSeq.sortBy`). That is
  * the documented bounded-sessions assumption of this operator (streaming
  * micro-batches bound it naturally; batch mode assumes no single user
  * dominates). A user with 10^8 events OOMs the task — for unbounded
  * per-user volumes use [[graft.plans.Sessionize.native]] instead: its
  * `requiredChildOrdering` makes Spark's sort (spillable, external) do the
  * ordering, and its per-partition pass holds O(1) state per open session.
  */
object StatefulSessions {

  case class Event(user_id: Long, event_id: Long, ts: LocalDateTime,
                   value: Double)
  /** Streaming twin of [[Event]]: watermarks require TIMESTAMP (an
    * instant), not TIMESTAMP_NTZ, so the streaming variant keys event time
    * on `java.sql.Timestamp`.
    */
  case class StreamEvent(user_id: Long, event_id: Long,
                         ts: java.sql.Timestamp, value: Double)
  case class SessionState(sessionId: Long, startUs: Long, lastUs: Long,
                          n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        duration_us: Long)

  private def micros(ts: LocalDateTime): Long =
    ts.toEpochSecond(ZoneOffset.UTC) * 1000000L + ts.getNano / 1000L

  /** Streaming-native variant: open sessions close via EVENT-TIME TIMEOUT
    * once the watermark passes last-event-time + gap — the production
    * semantics the batch-oriented [[sessionize]] only documents. A session
    * is emitted either because a later event of the SAME user exceeded the
    * gap, or because the WATERMARK did (no event needed — idle users'
    * state is reclaimed, which is what bounds the state store).
    *
    * `watermarkDelay` is the usual lateness/completeness trade; the input
    * gets `withWatermark(ts, delay)` applied here so the timeout clock and
    * the lateness bound always refer to the same column.
    */
  def sessionizeStreaming(events: Dataset[StreamEvent], gapSeconds: Long,
                          watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    val gapUs = gapSeconds * 1000000L
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    def micros(ts: java.sql.Timestamp): Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[StreamEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(userId, s.sessionId, s.n, s.lastUs - s.startUs))
          } else {
            val sorted = rows.toIndexedSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            def close(s: SessionState): Unit =
              out += SessionOut(userId, s.sessionId, s.n, s.lastUs - s.startUs)
            for (e <- sorted) {
              val us = micros(e.ts)
              st = st match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  Some(s.copy(lastUs = us, n = s.n + 1))
                case Some(s) =>
                  close(s)
                  Some(SessionState(s.sessionId + 1, us, us, 1))
                case None =>
                  Some(SessionState(1, us, us, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              // close when the WATERMARK (not another event) passes the gap
              state.setTimeoutTimestamp(s.lastUs / 1000 + gapSeconds * 1000)
            }
            out.iterator
          }
      }
  }

  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 emitOpen: Boolean): Dataset[SessionOut] = {
    val gapUs = gapSeconds * 1000000L
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // per-user events fit one group by assumption (bounded sessions)
          val sorted = rows.toIndexedSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          def close(s: SessionState): Unit =
            out += SessionOut(userId, s.sessionId, s.n, s.lastUs - s.startUs)
          for (e <- sorted) {
            val us = micros(e.ts)
            st = st match {
              case Some(s) if us - s.lastUs <= gapUs =>
                Some(s.copy(lastUs = us, n = s.n + 1))
              case Some(s) =>
                close(s)
                Some(SessionState(s.sessionId + 1, us, us, 1))
              case None =>
                Some(SessionState(1, us, us, 1))
            }
          }
          st match {
            case Some(s) if emitOpen => close(s); state.remove()
            case Some(s) => state.update(s)
            case None => ()
          }
          out.iterator
      }
  }
}
