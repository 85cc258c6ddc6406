package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BloomKeyIndex

/** The exact-key membership gate: route-then-confirm semantics are EXACT
  * (no false admits, no false drops), the confirm scan is partition-
  * pruned, and row-merge compaction is lossless.
  */
class BloomKeyIndexSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def cfgAt(topDir: java.nio.file.Path): BloomKeyIndex.Cfg =
    BloomKeyIndex.Cfg(topDir.resolve("idx").toString, keyExpr = "url",
      expectedItems = 10000L, numBits = 65536L)

  test("novelRows is exact: indexed keys dropped, fresh keys kept, " +
      "null keys kept, across multiple appended batches") {
    val cfg = cfgAt(Files.createTempDirectory("bloom_gate"))
    // empty index: everything is novel
    val b0 = Seq((1L, "u1"), (2L, "u2")).toDF("id", "url")
    assert(BloomKeyIndex.novelRows(b0, cfg).count() === 2)
    BloomKeyIndex.appendBatch(b0, cfg)
    BloomKeyIndex.appendBatch(
      Seq((3L, "u3"), (4L, "u4")).toDF("id", "url"), cfg)
    // arriving batch: two re-deliveries (one per past batch), two fresh,
    // one null key
    val batch = Seq((10L, "u1"), (11L, "u4"), (12L, "u9"), (13L, "u10"))
      .toDF("id", "url")
      .unionByName(Seq((14L, Option.empty[String])).toDF("id", "url"))
    val novel = BloomKeyIndex.novelRows(batch, cfg)
    assert(novel.columns.toSeq === Seq("id", "url"),
      "gate must return the batch's own columns")
    assert(novel.select("id").as[Long].collect().toSet ===
      Set(12L, 13L, 14L))
    // exactness under adversarial load: 3000 fresh keys through a
    // deliberately TIGHT filter (64k bits) — bloom false positives are
    // expected, but every one must be confirmed away by the key join
    BloomKeyIndex.appendBatch(
      (1 to 3000).map(i => (i.toLong, s"seen$i")).toDF("id", "url"), cfg)
    val mixed = ((1 to 1500).map(i => (10000L + i, s"seen$i")) ++
      (1 to 1500).map(i => (20000L + i, s"fresh$i"))).toDF("id", "url")
    val out = BloomKeyIndex.novelRows(mixed, cfg)
      .select("url").as[String].collect()
    assert(out.length === 1500 && out.forall(_.startsWith("fresh")),
      "route-then-confirm must be exact despite bloom false positives")
  }

  test("the confirm scan is partition-pruned to the suspects' kp values " +
      "and confirms on hash AND key (a colliding hash alone cannot " +
      "condemn a different key)") {
    val cfg = cfgAt(Files.createTempDirectory("bloom_prune"))
    BloomKeyIndex.appendBatch(
      (1 to 500).map(i => (i.toLong, s"u$i")).toDF("id", "url"), cfg)
    val keys = spark.read.parquet(s"${cfg.indexPath}/keys")
    assert(keys.columns.toSet === Set("khash", "key", "kp"))
    assert(keys.count() === 500)
    // one re-delivered key → suspects hit exactly one kp partition; the
    // literal IN filter must reach the scan as a PartitionFilter
    val one = Seq((99L, "u7")).toDF("id", "url")
    val hash = one.select(xxhash64(col("url").cast("string"))).as[Long]
      .collect().head
    val kp = java.lang.Math.floorMod(hash, 256L)
    val plan = {
      // replicate the gate's confirm subplan shape to inspect the scan
      val suspects = Seq((hash, "u7")).toDF("khash", "key")
      spark.read.parquet(s"${cfg.indexPath}/keys")
        .where(col("kp").isin(kp))
        .join(broadcast(suspects), Seq("khash", "key"), "left_semi")
        .queryExecution.executedPlan.toString
    }
    assert(plan.contains("PartitionFilters") && plan.contains("kp"),
      s"expected kp partition pruning in:\n$plan")
    assert(BloomKeyIndex.novelRows(one, cfg).count() === 0)
    // collision safety, simulated end to end: plant an index state in
    // which "other-url"'s HASH is both bloom-routed and present in the
    // keys table — but attached to a DIFFERENT key (the state a real
    // 64-bit collision would produce). The (hash, key) confirm must
    // keep "other-url" novel; a hash-only confirm would silently drop
    // it.
    val hash2 = Seq("other-url").toDF("url")
      .select(xxhash64(col("url").cast("string"))).as[Long].collect().head
    spark.createDataFrame(Seq((hash2, "not-other-url")))
      .toDF("khash", "key")
      .withColumn("kp", pmod(col("khash"), lit(256)))
      .write.mode("append").partitionBy("kp")
      .parquet(s"${cfg.indexPath}/keys")
    Seq(hash2).toDF("khash")
      .agg(count(lit(1)).as("n"),
        org.apache.spark.sql.GraftBridge.bloomFilterAgg(col("khash"),
          10000L, 65536L).as("bloom"))
      .coalesce(1).write.mode("append")
      .parquet(s"${cfg.indexPath}/bloom")
    val probe = Seq((1L, "other-url")).toDF("id", "url")
    assert(BloomKeyIndex.novelRows(probe, cfg)
      .select("id").as[Long].collect().toSeq === Seq(1L),
      "a colliding hash with a different key must stay novel")
  }

  test("compactRows: bloom rows OR-merge losslessly to one; keys leaves " +
      "compact; gate verdicts unchanged") {
    val cfg = cfgAt(Files.createTempDirectory("bloom_compact"))
    (0 until 4).foreach { b =>
      BloomKeyIndex.appendBatch(
        (1 to 100).map(i => (i.toLong, s"b${b}u$i")).toDF("id", "url"),
        cfg)
    }
    assert(spark.read.parquet(s"${cfg.indexPath}/bloom").count() === 4)
    val batch = (Seq((1L, "b2u50"), (2L, "b0u1")) ++
      Seq((3L, "neverseen"))).toDF("id", "url")
    val before = BloomKeyIndex.novelRows(batch, cfg)
      .select("id").as[Long].collect().toSet
    BloomKeyIndex.compactRows(spark, cfg)
    assert(spark.read.parquet(s"${cfg.indexPath}/bloom").count() === 1)
    assert(spark.read.parquet(s"${cfg.indexPath}/bloom")
      .select("n").as[Long].head() === 400L)
    val after = BloomKeyIndex.novelRows(batch, cfg)
      .select("id").as[Long].collect().toSet
    assert(before === after && after === Set(3L))
    // appends continue after the row-merge: once "neverseen" is indexed
    // the whole batch is known
    BloomKeyIndex.appendBatch(
      Seq((9L, "neverseen")).toDF("id", "url"), cfg)
    assert(BloomKeyIndex.novelRows(batch, cfg).count() === 0)
  }
}
