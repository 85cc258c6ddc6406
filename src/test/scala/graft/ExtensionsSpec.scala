package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

class ExtensionsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("SQL registration exposes the custom expressions") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].head()
    assert(dot === 32.0)
    val nShingles = spark.sql(
      "SELECT size(hashed_shingles('abcdef', 3)) AS n").as[Int].head()
    assert(nShingles === 4)
    val bucket = spark.sql(
      "SELECT hyperplane_bucket(array(1.0d, -2.0d), 8, 0) AS b").as[Long].head()
    assert(bucket >= 0 && bucket < 256)
    val ratio = spark.sql(
      "SELECT deflate_ratio(repeat('spam ', 100)) AS r").as[Double].head()
    assert(ratio > 0.0 && ratio < 0.2)
  }

  test("optimizer rule rewrites the HOF dot product to VectorDot") {
    GraftExtensions.register(spark)
    // parquet-backed input: a local relation would be constant-folded
    // before the rewrite is observable
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hof = emb.select(col("vec_id"), aggregate(
        zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("dot"))
      .orderBy("vec_id")
    assert(hof.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("vectordot"),
      s"expected VectorDot in:\n${hof.queryExecution.optimizedPlan}")
    val native = emb.select(col("vec_id"),
        graft.functions.VectorExpressions.vectorDot(col("v"), col("v")).as("dot"))
      .orderBy("vec_id")
    assert(hof.as[(Long, Double)].collect().toSeq ===
      native.as[(Long, Double)].collect().toSeq)
  }

  test("recallOf floor enforcement empties the row on violation " +
    "(deliberate degradation reads as 0 rows in the artifact)") {
    val truth = Seq(1L, 2L, 3L, 4L).toDF("id")
    val approx = Seq(1L, 2L, 3L).toDF("id") // recall 0.75
    val passing = ExtQueries.recallOf(truth, approx, Seq("id"), floor = 0.7)
      .collect()
    assert(passing.length === 1)
    assert(passing.head.getAs[Double]("recall") === 0.75)
    assert(passing.head.getAs[Boolean]("meets_floor"))
    // degraded: the same result against a floor it cannot clear must
    // surface as an EMPTY frame — spark_rows: 0 in CORRECTNESS_r{N}.json —
    // not as a hidden boolean
    val violated = ExtQueries.recallOf(truth, approx, Seq("id"), floor = 0.8)
    assert(violated.count() === 0L)
  }
}
