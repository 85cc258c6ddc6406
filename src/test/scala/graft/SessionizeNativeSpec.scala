package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GraftExtensions, Sessionize}

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

  test("plan: one hash exchange, no Window operators") {
    GraftExtensions.register(spark)
    val df = Sessionize.native(Tables.events(spark, sf), "user_id", "ts", 1800)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GapSessionize"), plan)
    assert(!plan.contains("Window"), plan)
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size === 1, plan)
  }
}
