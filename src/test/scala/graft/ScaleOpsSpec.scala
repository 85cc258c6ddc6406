package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.Bucketing

/** Scale-technique operators: salted skew join correctness, bucketed join
  * shuffle elimination (asserted on the physical plan).
  */
class ScaleOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("salted join returns exactly the plain join result under heavy skew") {
    // 10k rows, 90% on one hot key
    val big = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i))
      .toDF("k", "v")
    val small = (0L to 99L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = big.join(small, "k")
      .select("k", "v", "name").as[(Long, Int, String)]
      .collect().sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "name").as[(Long, Int, String)]
      .collect().sorted.toSeq
    assert(salted === plain)

    // the content-derived salt actually spreads the hot key across
    // sub-partitions (hashing ALL columns, not just the key)
    val spread = big.withColumn("__salt", Skew.contentSalt(big, 8))
      .filter(col("k") === 7L).select("__salt").distinct().count()
    assert(spread > 1)

    // and it is DETERMINISTIC: the same row gets the same salt regardless
    // of physical partitioning (rand()-based salting re-deals on a stage
    // retry or AQE re-partition — content hashing cannot)
    val assign = big.withColumn("__salt", Skew.contentSalt(big, 8))
      .as[(Long, Int, Int)].collect().toSet
    val reassign = big.repartition(13)
      .withColumn("__salt", Skew.contentSalt(big, 8))
      .as[(Long, Int, Int)].collect().toSet
    assert(assign === reassign)
  }

  test("z-order: Morton code fixture + clustered files have tight bounding boxes") {
    import graft.sources.ZOrder
    // bits=2, a=1 (01b), b=2 (10b): a.0→pos0=1, b.0→pos1=0, a.1→pos2=0,
    // b.1→pos3=1 ⇒ z = 1 + 8 = 9
    val fix = Seq((1L, 2L)).toDF("a", "b")
      .select(ZOrder.zValue(Seq(col("a"), col("b")), 2).as("z"))
      .as[Long].head()
    assert(fix === 9L)

    // clustering: uniform 2-D grid written z-clustered into 8 files —
    // every file's (a, b) bounding box must cover far less than the full
    // domain (what row-group min-max skipping feeds on); a 1-D sort by
    // `a` would leave each file's `b` range at the full domain
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    ZOrder.clusteredWrite(grid, dir, Seq("a", "b"), bits = 6, partitions = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 4)
    val boxes = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("a"), max("a"), min("b"), max("b")).collect().head
      (r.getLong(1) - r.getLong(0) + 1) * (r.getLong(3) - r.getLong(2) + 1)
    }
    val domain = 64L * 64L
    // average bounding-box area ≤ 40% of the domain (z-order quartering
    // gives ~2 boxes of 1/8 + overlap slack; a 1-D `a`-sort gives ~100%
    // per file because every file spans all of b)
    assert(boxes.sum.toDouble / boxes.length <= 0.4 * domain,
      boxes.mkString(","))
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force a shuffle join (broadcast joins reuse the build side as a
      // DPP-style filter instead) and drop the 10 GB scan-size floor so
      // the fixture-scale fact side qualifies
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val sf = "/root/testdata/sf0.001"
      val li = Tables.load(spark, sf, "lineitem").select("l_partkey", "l_quantity")
      val pt = Tables.load(spark, sf, "part")
        .filter(col("p_brand") === "Brand#13").select("p_partkey")
      val j = li.join(pt, li("l_partkey") === pt("p_partkey"))
      val optimized = j.queryExecution.optimizedPlan.toString.toLowerCase
      // the selective dim side must inject a bloom filter into the fact scan
      assert(optimized.contains("bloomfilter") || optimized.contains("bloom_filter"),
        j.queryExecution.optimizedPlan.toString)
      val n = j.count()
      // value-preserving: same count with the filter disabled
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(li.join(pt, li("l_partkey") === pt("p_partkey")).count() === n)
      assert(n > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("date-partitioned write prunes partitions at read (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("pruned").toString
    val df = (1 to 1000).map { i =>
      (i, f"2024-01-${i % 28 + 1}%02d", i * 1.5)
    }.toDF("id", "day", "v")
    df.write.mode("overwrite").partitionBy("day").parquet(dir)

    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    read.count()
    val plan = read.queryExecution.executedPlan.toString
    // the day predicate must prune directories, not scan-and-filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains("2024-01-05"), s"expected partition pruning:\n$plan")
    assert(read.count() === (1 to 1000).count(i => i % 28 + 1 == 5))
  }

  test("compaction merges small files without changing the data") {
    import graft.sources.Compaction
    val dir = java.nio.file.Files.createTempDirectory("compact")
      .resolve("t").toString
    val df = (1 to 10000).map(i => (i.toLong, s"row_$i")).toDF("id", "v")
    df.repartition(64).write.mode("overwrite").parquet(dir)
    val checksum = spark.read.parquet(dir)
      .agg(sum("id"), count(lit(1))).collect().head
    val (before, after) = Compaction.compact(spark, dir, targetBytes = 256 * 1024)
    assert(before === 64)
    assert(after < before, s"$before -> $after")
    val post = spark.read.parquet(dir).agg(sum("id"), count(lit(1))).collect().head
    assert(post === checksum)
  }

  test("bucketed equi-join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 5000).map(i => (i.toLong % 97, i)).toDF("k", "v")
      val dims = (0L to 96L).map(k => (k, s"d$k")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "graft_bkt_facts", "k", 8)
      Bucketing.writeBucketed(dims, "graft_bkt_dims", "k", 8)

      val joined = Bucketing.bucketedJoin(spark, "graft_bkt_facts",
        "graft_bkt_dims", "k")
      assert(joined.count() === 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")

      // control: the same join on plain (unbucketed) frames DOES shuffle
      val unbucketed = facts.join(dims, "k")
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dims")
    }
  }
}
