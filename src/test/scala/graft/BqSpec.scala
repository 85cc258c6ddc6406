package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bq, Similarity}

class BqSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // deterministic pseudo-random corpus + one planted near-neighbor of q
  private val rnd = new scala.util.Random(7)
  private val dim = 96 // > 64 so the packed code spans TWO words
  private val corpus = (1 to 300).map { i =>
    (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
  }
  private val q = Array.fill(dim)(rnd.nextGaussian().toFloat)
  private val planted = q.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
  private val corpusDf =
    (corpus :+ (999L, planted)).toDF("vec_id", "embedding")
  private val queryDf = Seq((0L, q)).toDF("vec_id", "embedding")

  test("encodeExpr packs sign bits exactly (toy vector, zero thresholds)") {
    val th = Array(0.0, 0.0, 0.0, 0.0)
    val code = Seq(Tuple1(Array(1f, -1f, 0.5f, -0.5f))).toDF("v")
      .select(Bq.encodeExpr(col("v"), th).as("code"))
      .as[Seq[Long]].head()
    assert(code === Seq(5L)) // bits 0 and 2 set
    // and the packed width follows ⌈dim/64⌉
    val wide = Seq(Tuple1(Array.fill(dim)(1f))).toDF("v")
      .select(Bq.encodeExpr(col("v"), Array.fill(dim)(0.0)).as("code"))
      .as[Seq[Long]].head()
    assert(wide.length === 2)
    assert(wide(0) === -1L)                 // 64 low bits all set
    assert(wide(1) === (1L << 32) - 1)      // 32 high bits set
  }

  test("hammingExpr: zero on self, symmetric, exact on a known pair") {
    val df = Seq((Seq(5L, 0L), Seq(3L, 1L))).toDF("a", "b")
    val (ab, ba, aa) = df.select(
        Bq.hammingExpr(col("a"), col("b")).as("ab"),
        Bq.hammingExpr(col("b"), col("a")).as("ba"),
        Bq.hammingExpr(col("a"), col("a")).as("aa"))
      .as[(Int, Int, Int)].head()
    assert(aa === 0)
    assert(ab === ba)
    assert(ab === 3) // xor word0 = 6 (2 bits), word1 = 1 (1 bit)
  }

  test("BQ index serve finds the planted neighbor first, with EXACT score") {
    val dir = java.nio.file.Files.createTempDirectory("bq_idx").toString
    Bq.writeBqIndex(corpusDf, "vec_id", "embedding", dir)
    val top = Bq.bqBatchTopKFromIndex(spark, dir, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5)
      .orderBy(col("score").desc).as[(Long, Long, Double)].collect()
    assert(top.head._2 === 999L)
    assert(top.head._3 > 0.99)
    // rerank scores are exact cosine — bit-equal to the brute-force anchor
    val exact = Similarity.bruteForceTopK(corpusDf, "vec_id", "embedding",
      queryDf, "embedding", 1).as[(Long, Double)].head()
    assert(top.head._3 === exact._2)
  }

  test("batched recall vs brute force clears the oversample contract") {
    val dir = java.nio.file.Files.createTempDirectory("bq_recall").toString
    val queries = corpusDf.filter(pmod(col("vec_id"), lit(30)) === 0)
    Bq.writeBqIndex(corpusDf, "vec_id", "embedding", dir)
    val truth = Similarity.bruteForceBatchTopK(corpusDf, "vec_id",
        "embedding", queries, "vec_id", "embedding", k = 5)
      .select("query_id", "vec_id")
    val approx = Bq.bqBatchTopKFromIndex(spark, dir, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, oversample = 16)
      .select("query_id", "vec_id")
    val total = truth.count()
    val found = truth.join(approx, Seq("query_id", "vec_id")).count()
    assert(found.toDouble / total >= 0.8,
      s"BQ recall ${found.toDouble / total} under 0.8")
  }

  test("append serves with FROZEN thresholds; retract excises, params stay") {
    val dir = java.nio.file.Files.createTempDirectory("bq_app").toString
    Bq.writeBqIndex(corpusDf.filter(col("vec_id") =!= 999L),
      "vec_id", "embedding", dir)
    val thBefore = Bq.readBqThresholds(spark, dir).toSeq
    Bq.appendToBqIndex(corpusDf.filter(col("vec_id") === 999L),
      "vec_id", "embedding", dir)
    assert(Bq.readBqThresholds(spark, dir).toSeq === thBefore)
    val top = Bq.bqBatchTopKFromIndex(spark, dir, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 3)
      .orderBy(col("score").desc).as[(Long, Long, Double)].collect()
    assert(top.head._2 === 999L) // the appended row serves
    Bq.retractFromBqIndex(spark, dir,
      Seq(999L).toDF("id"), "id", "vec_id")
    val after = Bq.bqBatchTopKFromIndex(spark, dir, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 3)
      .select("vec_id").as[Long].collect()
    assert(!after.contains(999L))
    assert(Bq.readBqThresholds(spark, dir).toSeq === thBefore)
    // idempotent: excising the absent id is a no-op
    Bq.retractFromBqIndex(spark, dir,
      Seq(999L).toDF("id"), "id", "vec_id")
  }

  test("tombstone overlay: serve excludes WHILE the rows physically persist") {
    val dir = java.nio.file.Files.createTempDirectory("bq_tomb").toString
    Bq.writeBqIndex(corpusDf, "vec_id", "embedding", dir)
    graft.sources.Tombstones.append(dir, Seq(999L).toDF("vec_id"), "vec_id")
    val served = Bq.bqBatchTopKFromIndex(spark, dir, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5)
      .select("vec_id").as[Long].collect()
    assert(!served.contains(999L))
    // the data table still holds the row — the overlay is the only gate
    assert(spark.read.parquet(s"$dir/data")
      .filter(col("vec_id") === 999L).count() === 1L)
  }

  test("IVF×BQ with nprobe = nlist degrades exactly to the flat BQ serve") {
    val flat = java.nio.file.Files.createTempDirectory("bq_flat").toString
    val ivf = java.nio.file.Files.createTempDirectory("bq_ivf").toString
    val queries = corpusDf.filter(pmod(col("vec_id"), lit(50)) === 0)
    Bq.writeBqIndex(corpusDf, "vec_id", "embedding", flat)
    Bq.writeIvfBqIndex(corpusDf, "vec_id", "embedding", ivf, nlist = 4)
    val a = Bq.bqBatchTopKFromIndex(spark, flat, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, oversample = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val b = Bq.ivfBqBatchTopKFromIndex(spark, ivf, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nprobe = 4, oversample = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(a === b)
    // and the pruned plan reads only the probed cells: with nprobe = 1
    // a query still gets k rows (from its own cell), all distinct
    val one = Bq.ivfBqBatchTopKFromIndex(spark, ivf, "vec_id", "embedding",
        queryDf, "vec_id", "embedding", k = 5, nprobe = 1)
      .select("vec_id").as[Long].collect()
    assert(one.length === 5 && one.distinct.length === 5)
  }
}
