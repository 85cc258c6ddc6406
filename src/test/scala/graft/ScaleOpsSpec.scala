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
