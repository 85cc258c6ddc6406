package graft

import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GraftExtensions, Sessionize}
import graft.streaming.StatefulSessions

/** The custom whole-operator Catalyst path (GapSessionize LogicalPlan →
  * Strategy → one-pass SparkPlan) must equal the declarative window form
  * row for row, and must plan exactly one data exchange.
  */
class SessionizeNativeSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  test("native sessionize equals the two-window-pass form row for row") {
    GraftExtensions.register(spark)
    val native = Queries.queries("q_sessionize_native")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val window = Queries.queries("q_sessionize")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native === window)
  }

  private def eventsDf(rows: Seq[Row]): DataFrame = {
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = true),
      StructField("event_id", LongType, nullable = true),
      StructField("ts", TimestampNTZType, nullable = true),
      StructField("value", DoubleType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("user_id").asc_nulls_last, col("session_id"))
      .collect().map(_.toSeq).toSeq

  /** An event EXACTLY gap seconds after its predecessor: ALL FOUR
    * implementations keep it in the same session. For session_window this
    * is not obvious from the half-open [ts, ts+gap) notation — Spark
    * coalesces a window whose start equals the current session's end — so
    * this fixture is what licenses q_session_window to share the
    * strict-(>) DuckDB oracle with the lag-based forms.
    */
  test("exact-gap boundary: all four implementations agree (strict >)") {
    GraftExtensions.register(spark)
    val t0 = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val df = eventsDf(Seq(
      Row(1L, 1L, t0, 1.0),
      Row(1L, 2L, t0.plusSeconds(1800), 1.0),
      Row(1L, 3L, t0.plusSeconds(1900), 1.0)))

    val strictExpected = Seq(Seq(1L, 1L, 3L, 1900000000L))
    assert(rowsOf(Queries.sessionizeDeclarative(
      df.select("user_id", "event_id", "ts"), 1800)) === strictExpected)
    assert(rowsOf(Sessionize.native(df, "user_id", "ts", 1800)) === strictExpected)
    implicit val enc =
      org.apache.spark.sql.Encoders.product[StatefulSessions.Event]
    assert(rowsOf(StatefulSessions.sessionize(
      df.as(enc), gapSeconds = 1800, emitOpen = true).toDF()) === strictExpected)

    assert(rowsOf(Queries.sessionizeSessionWindow(df, "30 minutes")) ===
      strictExpected)
  }

  /** Null user/ts rows: the native operator EXCLUDES them by documented
    * contract (InternalRow.getLong on a null slot is undefined — letting
    * them through would silently merge into user 0 / epoch 0), while the
    * declarative window form groups them (null users form their own
    * partition; a null ts's null gap starts a session with null duration).
    */
  test("null user/ts: native excludes by contract, declarative groups them") {
    GraftExtensions.register(spark)
    val t0 = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val df = eventsDf(Seq(
      Row(1L, 1L, t0, 1.0),
      Row(1L, 2L, t0.plusSeconds(100), 1.0),
      Row(null, 3L, t0, 1.0),
      Row(2L, 4L, null, 1.0)))

    assert(rowsOf(Sessionize.native(df, "user_id", "ts", 1800)) ===
      Seq(Seq(1L, 1L, 2L, 100000000L)))
    assert(rowsOf(Queries.sessionizeDeclarative(
      df.select("user_id", "event_id", "ts"), 1800)) === Seq(
      Seq(1L, 1L, 2L, 100000000L),
      Seq(2L, 1L, 1L, null),
      Seq(null, 1L, 1L, 0L)))
  }

  test("plan: one hash exchange, no Window operators") {
    GraftExtensions.register(spark)
    val df = Sessionize.native(Tables.events(spark, sf), "user_id", "ts", 1800)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GapSessionize"), plan)
    assert(!plan.contains("Window"), plan)
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size === 1, plan)
  }
}
