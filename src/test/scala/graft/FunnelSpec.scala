package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val steps = Seq(
    "a" -> (col("et") === "A"),
    "b" -> (col("et") === "B"),
    "c" -> (col("et") === "C"))

  test("funnel: strict ordering, earliest chain, out-of-order and " +
      "simultaneous events don't count") {
    val events = Seq(
      // u1 completes in order; the LATER duplicate A must not move t_a
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "A", ts("2024-01-01 12:00:00")),
      (1L, "B", ts("2024-01-01 10:30:00")),
      (1L, "C", ts("2024-01-01 11:00:00")),
      // u2: B BEFORE its A — never chains past step a
      (2L, "B", ts("2024-01-01 09:00:00")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      // u3: B simultaneous with A — strict > rejects it
      (3L, "A", ts("2024-01-01 10:00:00")),
      (3L, "B", ts("2024-01-01 10:00:00")),
      // u4 never enters (no A)
      (4L, "C", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "et", "ts")
    val r = Funnel.funnel(events, "user_id", "ts", steps)
      .orderBy("user_id")
      .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp], Int)].collect()
    assert(r.map(_._1).toSeq === Seq(1L, 2L, 3L)) // u4 absent
    assert(r(0)._2.get === ts("2024-01-01 10:00:00")) // earliest A
    assert(r(0)._5 === 3)
    assert(r(1)._5 === 1 && r(1)._3.isEmpty)
    assert(r(2)._5 === 1 && r(2)._3.isEmpty)
  }

  test("funnel: a later A can rescue nothing the earliest A couldn't — " +
      "greedy-earliest is complete") {
    // A@10, A@12, B@11: the earliest A chains to B@11; a per-later-A scan
    // would find the same completion, never more
    val events = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "A", ts("2024-01-01 12:00:00")),
      (1L, "B", ts("2024-01-01 11:00:00"))
    ).toDF("user_id", "et", "ts")
    val r = Funnel.funnel(events, "user_id", "ts", steps.take(2))
      .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
      .head()
    assert(r._3.get === ts("2024-01-01 11:00:00"))
    assert(r._4 === 2)
  }

  test("funnelCounts: per-step population and conversion") {
    val events = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 11:00:00")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      (3L, "A", ts("2024-01-01 10:00:00")),
      (3L, "B", ts("2024-01-01 11:00:00")),
      (3L, "C", ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "et", "ts")
    val r = Funnel.funnelCounts(events, "user_id", "ts", steps)
      .orderBy("step").as[(Int, String, Long, Double)].collect()
    assert(r.toSeq === Seq(
      (1, "a", 3L, 1.0),
      (2, "b", 2L, math.rint(2.0 / 3 * 1e6) / 1e6),
      (3, "c", 1L, 0.5)))
  }
}
