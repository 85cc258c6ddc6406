package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile

class ProfileSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(2.5), Some("b")),
    (2L, None, Some("a")),
    (3L, Some(2.5), None),
    (4L, Some(9.0), Some("a"))
  ).toDF("id", "score", "tag")

  test("exact profile: null counts, distincts, typed min/max lanes") {
    val got = Profile.summary(fixture, exact = true)
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      ("id", 4L, 0L, 4L, Some(1.0), Some(4.0), None, None),
      ("score", 4L, 1L, 2L, Some(2.5), Some(9.0), None, None),
      ("tag", 4L, 1L, 2L, None, None, Some("a"), Some("b"))))
  }

  test("column subset + unknown column fails loudly") {
    assert(Profile.summary(fixture, Seq("id")).count() === 1)
    intercept[IllegalArgumentException] {
      Profile.summary(fixture, Seq("nope"))
    }
  }

  test("approx profile plans WITHOUT Expand (single non-replicated pass) " +
      "and its distincts are exact on small cardinalities") {
    val prof = Profile.summary(fixture)
    assert(!prof.queryExecution.executedPlan.toString.contains("Expand"),
      "HLL profile must not expand the scan")
    // the exact path DOES expand — that's the documented trade
    assert(Profile.summary(fixture, exact = true)
      .queryExecution.executedPlan.toString.contains("Expand"))
    val byCol = prof.select("col_name", "n_distinct")
      .as[(String, Long)].collect().toMap
    assert(byCol === Map("id" -> 4L, "score" -> 2L, "tag" -> 2L))
  }

  test("outliers: hand-computed z, degenerate groups emit nothing") {
    // group a: values 1,1,1,1,101 — mean 21, sd 44.72…, z(101) = 1.789 →
    // only the 2.5σ threshold misses it; at 1.5 it's the lone outlier.
    // group b: constant (sd 0) and group c: singleton (sd null) → nothing.
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 1.0), ("a", 4L, 1.0),
      ("a", 5L, 101.0), ("b", 6L, 7.0), ("b", 7L, 7.0), ("c", 8L, 9.0)
    ).toDF("g", "id", "v")
    val hit = Profile.outliers(df, Seq("g"), "v", zThreshold = 1.5)
      .select("id", "z").as[(Long, Double)].collect().toSeq
    assert(hit.map(_._1) === Seq(5L))
    val expected = (101.0 - 21.0) / 44.72135954999579
    assert(math.abs(hit.head._2 - expected) < 1e-9)
    assert(Profile.outliers(df, Seq("g"), "v", 1.8).count() === 0)
  }

  test("olsByGroup: exact fit recovers the line, degenerate groups " +
      "serve nulls, null pairs excluded") {
    val rows = Seq(
      // g1: y = 2x + 1 exactly, plus a null-y row (excluded)
      ("g1", 1.0, 3.0), ("g1", 2.0, 5.0), ("g1", 3.0, 7.0),
      ("g1", 4.0, Double.NaN),
      // g2: constant y (zero y-variance): slope defined, corr/r2 null
      ("g2", 1.0, 4.0), ("g2", 2.0, 4.0), ("g2", 3.0, 4.0),
      // g3: single point: no line
      ("g3", 5.0, 9.0),
      // g4: zero x-variance: no line
      ("g4", 2.0, 1.0), ("g4", 2.0, 3.0))
      .toDF("g", "x", "y")
      .withColumn("y", when(isnan(col("y")), lit(null)).otherwise(col("y")))
    val r = Profile.olsByGroup(rows, Seq("g"), "x", "y")
      .collect().map(x => x.getString(0) -> x).toMap
    val g1 = r("g1")
    assert(g1.getLong(g1.fieldIndex("n")) === 3L, "null pair excluded")
    assert(math.abs(g1.getDouble(g1.fieldIndex("slope")) - 2.0) < 1e-12)
    assert(math.abs(g1.getDouble(g1.fieldIndex("intercept")) - 1.0)
      < 1e-12)
    assert(math.abs(g1.getDouble(g1.fieldIndex("r2")) - 1.0) < 1e-12)
    val g2 = r("g2")
    assert(math.abs(g2.getDouble(g2.fieldIndex("slope"))) < 1e-12)
    assert(g2.isNullAt(g2.fieldIndex("corr")) &&
      g2.isNullAt(g2.fieldIndex("r2")))
    Seq("g3", "g4").foreach { g =>
      assert(r(g).isNullAt(r(g).fieldIndex("slope")) &&
        r(g).isNullAt(r(g).fieldIndex("intercept")),
        s"$g: a vertical or single-point fit is not a line")
    }
  }
}
