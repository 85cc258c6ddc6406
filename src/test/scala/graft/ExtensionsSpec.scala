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
}
