package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Merge, Profile}

/** SCD2 history folding: interval chains and change collapsing by hand,
  * null attributes as values (not wildcards), and the incremental-apply
  * law — batched [[Merge.scd2Apply]] equals the one-shot [[Merge.scd2]]
  * fold under the append-only version contract. Plus the CUSUM
  * changepoint: exact trace values and shift localization.
  */
class MergeScdSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private type Rec = (Long, Long, String, Option[Long])
  private def fold(recs: Seq[Rec]) =
    Merge.scd2(recs.toDF("k", "v", "status", "tier"),
      Seq("k"), "v", Seq("status", "tier"))
  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "valid_from", "status", "tier", "valid_to",
        "is_current")
      .as[(Long, Long, String, Option[Long], Option[Long], Boolean)]
      .collect().toSet

  test("hand case: consecutive identical versions collapse into one " +
      "interval, valid_to chains to the next change, last row current") {
    val recs: Seq[Rec] = Seq(
      (1L, 10L, "open", Some(1L)),
      (1L, 11L, "open", Some(1L)),   // no change — collapses
      (1L, 12L, "open", Some(2L)),   // tier change
      (1L, 15L, "closed", Some(2L)), // status change
      (2L, 10L, "open", None))       // second key, null attr, single row
    assert(asSet(fold(recs)) === Set(
      (1L, 10L, "open", Some(1L), Some(12L), false),
      (1L, 12L, "open", Some(2L), Some(15L), false),
      (1L, 15L, "closed", Some(2L), None, true),
      (2L, 10L, "open", None, None, true)))
  }

  test("null attributes are values: null→null is no change, null→x and " +
      "x→null are changes, and a first row with all-null attrs is kept") {
    val recs = Seq(
      (1L, 1L, null.asInstanceOf[String], Option.empty[Long]),
      (1L, 2L, null.asInstanceOf[String], Option.empty[Long]), // no change
      (1L, 3L, "a", Option.empty[Long]),                       // null→a
      (1L, 4L, null.asInstanceOf[String], Option.empty[Long])) // a→null
    val got = asSet(fold(recs))
    assert(got.map(r => (r._2, Option(r._3))) ===
      Set((1L, None), (3L, Some("a")), (4L, None)))
    assert(got.count(_._6) === 1)
  }

  test("randomized law: scd2Apply over version-ordered batches equals " +
      "the one-shot fold — including no-op batches and new keys " +
      "appearing mid-stream") {
    val rnd = new scala.util.Random(31)
    (1 to 3).foreach { trial =>
      val recs: Seq[Rec] = (1L to 60L).map { v =>
        val k = 1L + rnd.nextInt(5)
        val status = Seq("a", "b", null).apply(rnd.nextInt(3))
        val tier = if (rnd.nextBoolean()) Some(rnd.nextInt(2).toLong)
                   else None
        (k, v, status.asInstanceOf[String], tier)
      }
      val oneShot = asSet(fold(recs))
      // version-ordered batches: the append-only contract
      val batches = recs.sortBy(_._2).grouped(20).toSeq
      var history = fold(batches.head)
      batches.tail.foreach { b =>
        history = Merge.scd2Apply(history,
          b.toDF("k", "v", "status", "tier"),
          Seq("k"), "v", Seq("status", "tier"))
      }
      assert(asSet(history) === oneShot, s"trial $trial")
    }
  }

  test("stored SCD2: batched applies equal the one-shot fold, closed " +
      "files are never rewritten, and the pinned crash window (duplicate " +
      "closed append) heals losslessly via scd2DedupeStored") {
    import java.nio.file.Files
    val path = Files.createTempDirectory("scd2_store").resolve("h").toString
    val rnd = new scala.util.Random(37)
    val recs: Seq[Rec] = (1L to 60L).map { v =>
      (1L + rnd.nextInt(4), v,
        Seq("a", "b").apply(rnd.nextInt(2)),
        if (rnd.nextBoolean()) Some(rnd.nextInt(2).toLong) else None)
    }
    val batches = recs.sortBy(_._2).grouped(20).toSeq
    Merge.scd2WriteStored(batches.head.toDF("k", "v", "status", "tier"),
      path, Seq("k"), "v", Seq("status", "tier"))
    Merge.scd2ApplyStored(spark, path,
      batches(1).toDF("k", "v", "status", "tier"),
      Seq("k"), "v", Seq("status", "tier"))
    // closed files written so far must survive the NEXT apply untouched
    def closedFiles = Option(new java.io.File(path, "is_current=false")
      .listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val before = closedFiles
    assert(before.nonEmpty)
    Merge.scd2ApplyStored(spark, path,
      batches(2).toDF("k", "v", "status", "tier"),
      Seq("k"), "v", Seq("status", "tier"))
    assert(before.subsetOf(closedFiles),
      "an apply must never rewrite already-closed files")
    assert(asSet(Merge.scd2ReadStored(spark, path)) === asSet(fold(recs)))
    // crash window: re-run ONLY the closed-append step (a replay that
    // died before the current-partition overwrite re-appends the same
    // closed rows) — visible duplication, healed by the dedupe swap
    val closed = Merge.scd2ReadStored(spark, path)
      .where(!org.apache.spark.sql.functions.col("is_current"))
    val closedCount = closed.count()
    closed.drop("is_current").limit(3).write.mode("append")
      .parquet(path + "/is_current=false")
    assert(Merge.scd2ReadStored(spark, path)
      .where(!org.apache.spark.sql.functions.col("is_current"))
      .count() === closedCount + 3)
    Merge.scd2DedupeStored(spark, path)
    assert(asSet(Merge.scd2ReadStored(spark, path)) === asSet(fold(recs)))
  }

  test("reserved output names and empty column lists fail loudly") {
    intercept[IllegalArgumentException] {
      Merge.scd2(Seq((1L, 1L, true)).toDF("k", "v", "is_current"),
        Seq("k"), "v", Seq("is_current"))
    }
    intercept[IllegalArgumentException] {
      Merge.scd2(Seq((1L, 1L)).toDF("k", "v"), Seq("k"), "v", Seq.empty)
    }
  }

  test("CUSUM: exact trace over a planted level shift, extremum at the " +
      "shift boundary; a constant series traces zero everywhere") {
    val series = ((1 to 10).map(i => (i.toLong, 10L)) ++
      (11 to 20).map(i => (i.toLong, 20L))).toDF("t", "v")
    val trace = Profile.cusum(series, "t", "v")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // mean 15: cusum walks -5 per step to -50 at t=10, +5 back to 0
    assert(trace.map(_._3).toSeq ===
      ((1 to 10).map(i => -5.0 * i) ++
        (9 to 0 by -1).map(i => -5.0 * i)).toSeq)
    val cp = Profile.changepoint(series, "t", "v")
      .as[(Long, Long, Double, Double)].collect().head
    assert(cp._1 === 10L && cp._4 === 50.0)
    val flat = (1 to 8).map(i => (i.toLong, 7L)).toDF("t", "v")
    assert(Profile.cusum(flat, "t", "v").as[(Long, Long, Double)]
      .collect().forall(_._3 === 0.0))
  }

  test("seasonal anomaly: a spike is odd only against ITS season's " +
      "baseline; constant and singleton seasons serve null z") {
    // season 0: values 10,10,10,40 (spike); season 1: constant 20s;
    // season 2: a single point
    val pts = Seq(
      (1L, 0L, 10L), (2L, 0L, 10L), (3L, 0L, 10L), (4L, 0L, 40L),
      (5L, 1L, 20L), (6L, 1L, 20L), (7L, 1L, 20L),
      (8L, 2L, 99L)).toDF("t", "season", "v")
    val out = Profile.seasonalAnomaly(pts, "t", "season", "v")
      .as[(Long, Long, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // season 0: mean 17.5, sample sd 15 → spike z = 22.5/15 = 1.5
    assert(math.abs(out(4L)._5.get - 1.5) < 1e-9)
    assert(math.abs(out(1L)._5.get - (-0.5)) < 1e-9)
    // zero-variance and singleton seasons: null z, never NaN
    assert(Seq(5L, 6L, 7L, 8L).forall(out(_)._5.isEmpty))
    assert(out(8L)._4 === 99.0)
  }
}
