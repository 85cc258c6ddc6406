package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

class JoinsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: most recent right row at or before each left row, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:30:00"), 105.0),
      (2L, ts("2024-01-01 10:10:00"), 50.0)
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, 1, ts("2024-01-01 09:59:00")), // before any quote → null
      (1L, 2, ts("2024-01-01 10:05:00")), // tie → same-instant quote (≥)
      (1L, 3, ts("2024-01-01 10:07:00")), // between → 10:05 quote
      (1L, 4, ts("2024-01-01 11:00:00")), // after all → 10:30 quote
      (2L, 5, ts("2024-01-01 10:20:00")), // other key → its own quote
      (3L, 6, ts("2024-01-01 10:20:00"))  // key with no quotes → null
    ).toDF("k", "trade_id", "tts")

    val out = Joins.asofJoin(trades, quotes, "k", "tts", "qts")
      .select("trade_id", "asof_price")
      .as[(Int, Option[Double])].collect().toMap
    assert(out === Map(
      1 -> None, 2 -> Some(101.0), 3 -> Some(101.0),
      4 -> Some(105.0), 5 -> Some(50.0), 6 -> None))
  }

  test("rangeJoin: inclusive banded window, same key only") {
    val l = Seq((1L, 10, ts("2024-01-01 10:00:00")))
      .toDF("k", "lid", "lts")
    val r = Seq(
      (1L, 100, ts("2024-01-01 09:59:59")), // before window
      (1L, 101, ts("2024-01-01 10:00:00")), // lower bound inclusive
      (1L, 102, ts("2024-01-01 10:30:00")), // inside
      (1L, 103, ts("2024-01-01 11:00:00")), // upper bound inclusive
      (1L, 104, ts("2024-01-01 11:00:01")), // past window
      (2L, 105, ts("2024-01-01 10:30:00"))  // other key
    ).toDF("k", "rid", "rts")
    val got = Joins.rangeJoin(l, r, "k", "lts", "rts", 0, 3600)
      .select("lid", "r_rid").as[(Int, Int)].collect().toSet
    assert(got === Set((10, 101), (10, 102), (10, 103)))
  }

  test("fuzzyJoin: length-banded equi-join finds exactly the pairs within " +
      "edit distance, broadcast plan, no nested loop over the corpus") {
    val corpus = Seq((1L, "cat"), (2L, "cut"), (3L, "cart"), (4L, "dog"),
      (5L, "ca")).toDF("id", "name")
    val probes = Seq((100L, "cat")).toDF("id", "name")
    val out = Joins.fuzzyJoin(probes, corpus, "name", "name", 1)
      .select("probe_id", "id", "distance").as[(Long, Long, Int)]
      .collect().toSet
    // cat=0, cut=1 (sub), cart=1 (ins), ca=1 (del); dog excluded
    assert(out === Set((100L, 1L, 0), (100L, 2L, 1), (100L, 3L, 1),
      (100L, 5L, 1)))
    // exact-complete blocking: agrees with the naive cross verify
    val naive = corpus.crossJoin(
        probes.select(col("id").as("pid"), col("name").as("pname")))
      .where(levenshtein(col("pname"), col("name")) <= 1)
      .select("pid", "id").as[(Long, Long)].collect().toSet
    assert(out.map(t => (t._1, t._2)) === naive)
    // the corpus side joins broadcast-hash, never nested-loop
    val plan = Joins.fuzzyJoin(probes, corpus, "name", "name", 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("fuzzySelfJoin: exact pair set vs brute-force Levenshtein at d=1 " +
      "and d=2, including cross-length and tiny strings") {
    // driver-side reference implementation (classic DP)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val rnd = new scala.util.Random(11)
    // clustered strings (mutations of a few stems) + genuinely random
    // ones + degenerate tiny strings — the mix that exercises every
    // branch: equal/unequal lengths, empty segments, shared prefixes
    val stems = Seq("abcabcab", "xyzxyzxy", "aaaaabbb")
    val strings = (stems.flatMap { s =>
      Seq(s, s.drop(1), s + "c", s.updated(3, 'q'),
        s.take(4) + "z" + s.drop(5))
    } ++ (1 to 30).map(_ =>
      (1 to 2 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString) ++ Seq("a", "b", "ab", "")).distinct
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "txt")
    for (d <- Seq(1, 2)) {
      val truth = (for {
        (a, i) <- strings.zipWithIndex
        (b, j) <- strings.zipWithIndex
        if i < j && lev(a, b) <= d
      } yield (i.toLong, j.toLong, lev(a, b))).toSet
      val got = Joins.fuzzySelfJoin(df, "id", "txt", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === truth, s"d=$d mismatch: " +
        s"missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
    }
    // plan shape: a plain shuffle equi-join — never a nested loop, and
    // with auto-broadcast off (the corpus-scale setting; the tiny fixture
    // would otherwise broadcast) both sides meet in a shuffle join
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Joins.fuzzySelfJoin(df, "id", "txt", 1)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("fuzzyCrossJoin: exact cross-frame pair set vs brute-force " +
      "Levenshtein (distance-0 cross duplicates included, no " +
      "within-side pairs), id round-trip, and loud id-contract failure") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val rnd = new scala.util.Random(13)
    def word() = (1 to 2 + rnd.nextInt(7))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    // overlapping vocabularies so distance-0 cross pairs exist; ids on
    // the two sides collide numerically on purpose (the parity tag must
    // keep them apart)
    val ls = ((1 to 25).map(i => (i.toLong, word())) ++
      Seq((90L, "abab"), (91L, ""))).distinct
    val rs = ((1 to 25).map(i => (i.toLong, word())) ++
      Seq((90L, "abab"), (92L, "a"))).distinct
    for (d <- Seq(1, 2)) {
      val truth = (for {
        (li, la) <- ls; (ri, ra) <- rs
        if lev(la, ra) <= d
      } yield (li, ri, lev(la, ra))).toSet
      val got = Joins.fuzzyCrossJoin(
          ls.toDF("lid", "ltxt"), "lid", "ltxt",
          rs.toDF("rid", "rtxt"), "rid", "rtxt", d)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === truth, s"d=$d mismatch: " +
        s"missing=${(truth -- got).take(5)} extra=${(got -- truth).take(5)}")
    }
    // the id contract fails the JOB, not silently: a negative id would
    // collide after the parity fold
    val err = intercept[Exception] {
      Joins.fuzzyCrossJoin(
        Seq((-1L, "abc")).toDF("lid", "ltxt"), "lid", "ltxt",
        Seq((1L, "abc")).toDF("rid", "rtxt"), "rid", "rtxt", 1).collect()
    }
    assert(err.getMessage != null)
    intercept[IllegalArgumentException] {
      Joins.fuzzyCrossJoin(
        Seq((1L, "a")).toDF("id", "t"), "id", "t",
        Seq((1L, "a")).toDF("id", "t2"), "id", "t2", 1)
    }
  }
}
