package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke (t1): entry returns rows on sf0.001, and every
  * declared oracle key has a matching query.
  */
class EntrySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; bench subset is a query subset") {
    val qs = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
    val orphanBench = SparkEntry.benchQueries.toSet.diff(qs)
    assert(orphanBench.isEmpty, s"bench names without queries: $orphanBench")
  }

  // The round-12 postmortem tripwire: rounds 10–11 silently lost the
  // 19-row events query family — a testdata timestamp-layout change made
  // the watermark compare return ZERO rows, the queries "ran", the rows
  // vanished from the correctness artifact, and the bench timed empty
  // scans, all with no red signal for two rounds. The failure class is "a
  // query evaporates without failing", so the guard is exactly that
  // assertion: EVERY SparkEntry query must return rows on sf0.001.
  // Against the r10 layout, s2_scan_filter/q_asof_join/q_sessionize/…
  // would have returned 0 here and this test would have gone red.
  // A query that is legitimately empty at this SF must be allowlisted
  // explicitly — silence is never a pass.
  test("tripwire: every SparkEntry query returns rows at sf0.001") {
    val d = "/root/testdata/sf0.001"
    // Explicitly-empty-at-THIS-SF allowlist — each entry verified to
    // return rows and pass at the driver's sf0.01 gate:
    //  - q7_nation_volume / q21_sole_blame: genuinely selective TPC-H
    //    shapes (two-nation trade window; sole-blame supplier on a
    //    multi-supplier order) with zero qualifying rows in a ~6k-row
    //    lineitem sample
    //  - ann_pca_recall: a floor-enforced twin (empties itself below
    //    recall 0.9); the floor is calibrated against sf0.01 corpus
    //    geometry, and the 10×-smaller embedding sample sits under it
    val allowEmpty = Set("q7_nation_volume", "q21_sole_blame",
      "ann_pca_recall")
    val broken = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => allowEmpty(q._1))
      .flatMap { case (name, q) =>
        try { if (q(spark, d).isEmpty) Some(s"$name: 0 rows") else None }
        catch { case e: Throwable =>
          Some(s"$name: threw ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    assert(broken.isEmpty,
      s"${broken.size} queries evaporated:\n  ${broken.mkString("\n  ")}")
  }

  // The dual-layout events reader itself, against a SYNTHETIC old-layout
  // fixture — the tripwire above catches an evaporation after the fact;
  // this pins the ns-long branch directly so it keeps working even while
  // the shipped testdata is in the µs layout (the r10/r11 regression ran
  // the other way: a reader built for ns met µs data).
  test("events reader: ns-long layout normalizes to TIMESTAMP_NTZ µs " +
      "and watermark-filters") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("events_ns").toString
    // 2024-01-01T00:00:00 + 123456789 ns, and one event an hour later
    Seq((1L, 1704067200L * 1000000000L + 123456789L, 7L, "click"),
        (2L, 1704070800L * 1000000000L, 8L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType.typeName === "timestamp_ntz")
    val first = e.orderBy("event_id")
      .select(col("ts").cast("string")).as[String].head()
    // ns → µs truncation, the same DuckDB applies reading ns parquet
    assert(first === "2024-01-01 00:00:00.123456", first)
    assert(e.where(col("ts") >
      lit("2024-01-01 00:30:00").cast("timestamp_ntz")).count() === 1)
  }

  // q8 is the widest join tree in the suite (6 tables, nation twice): at
  // 100 TB the fact table must be joined entirely by broadcast — a single
  // shuffled join there would move the whole lineitem scan. Assert every
  // join planned broadcast; the only exchange is the final per-year agg's.
  test("q8_market_share joins are all broadcast — no shuffled join") {
    val plan = SparkEntry.queries("q8_market_share")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan)
  }

  // Q21's correlated EXISTS/NOT EXISTS pair must plan as real semi/anti
  // hash or merge joins with the `<> suppkey` residual — a nested-loop or
  // cartesian fallback there is the difference between one lineitem
  // shuffle and lineitem² at 100 TB.
  test("q21 correlated pair plans as semi+anti joins, no nested loop") {
    val plan = SparkEntry.queries("q21_sole_blame")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // The generated partsupp dimension (Q2/Q11/Q16/Q20's input) — the
  // invariants the four shapes lean on: exactly 4 rows per part, the 4
  // suppkeys per part DISTINCT (13·i mod |S| injective on i∈0..3), every
  // suppkey a real supplier, and every derived column non-null. The
  // cross-engine bit-parity itself is proven by the four hash-green
  // oracles; this spec guards the generator's shape against drift.
  test("partsuppGen: 4 distinct real suppliers per part, no nulls") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val ps = Queries.partsuppGen(spark, d).cache()
    try {
      val nPart = spark.read.parquet(s"$d/part.parquet").count()
      assert(ps.count() == 4 * nPart)
      val perPart = ps.groupBy("ps_partkey")
        .agg(countDistinct("ps_suppkey").as("n")).filter(col("n") =!= 4)
      assert(perPart.count() == 0, "a part lost a distinct supplier")
      val supp = spark.read.parquet(s"$d/supplier.parquet")
        .select(col("s_suppkey"))
      assert(ps.join(supp, col("ps_suppkey") === col("s_suppkey"),
        "left_anti").count() == 0, "generated suppkey outside supplier")
      assert(ps.filter(col("ps_availqty").isNull ||
        col("ps_costc").isNull || col("ps_suppkey").isNull).count() == 0)
    } finally ps.unpersist()
  }
}
