package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JobText

/** Property tests (SURVEY.md §5.2.3): salary mean bounded by the range,
  * duration round-trips, title cleaning idempotent. Uses ScalaCheck Gens
  * sampled with a fixed seed (the scalatest-scalacheck bridge artifact is
  * not in the offline cache).
  */
class PropertySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 25): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("salaryAvg(lo..hi) lies within [lo, hi]") {
    val cases = samples(Gen.zip(Gen.choose(1, 80), Gen.choose(1, 40)))
    val df = cases.map { case (lo, span) => (lo, lo + span, s"$lo - ${lo + span} triệu") }
      .toDF("lo", "hi", "s")
    val bad = df.select(col("lo"), col("hi"),
        JobText.salaryAvg(JobText.cleanSalary(col("s"))).as("avg"))
      .filter(col("avg") < col("lo") || col("avg") > col("hi"))
    assert(bad.count() === 0)
  }

  test("relativeSeconds round-trips generated Vietnamese durations") {
    val units = Seq(("giây", 1L), ("phút", 60L), ("giờ", 3600L), ("ngày", 86400L))
    val cases = samples(Gen.zip(Gen.choose(1, 500), Gen.choose(0, 3)), 40)
    val df = cases.map { case (n, u) =>
      (s"Còn $n ${units(u)._1} nữa", n * units(u)._2)
    }.toDF("t", "expect")
    val bad = df.select(JobText.relativeSeconds(col("t")).as("got"), col("expect"))
      .filter(col("got") =!= col("expect"))
    assert(bad.count() === 0)
  }

  test("cleanTitle is idempotent") {
    val titles = Seq(
      "Java Developer - Lương Upto 30Tr", "Nhân Viên IT/ Bảo Trì",
      "🔥 Tester (Fresher)", "Data Engineer - HCM - 25 triệu",
      "  spaced  out  title  ", "...", "a-b-c", "x / y / z")
    val once = titles.toDF("t")
      .select(JobText.cleanTitle(col("t")).as("v")).as[String].collect().toSeq
    val twice = once.toDF("t")
      .select(JobText.cleanTitle(col("t")).as("v")).as[String].collect().toSeq
    assert(twice === once)
  }

  // random corpora from a 6-word vocab make duplicated k-windows common —
  // the regime where span-removal bookkeeping has to stay consistent
  private def randomCorpus(seedBase: Long, nDocs: Int): Seq[(Long, String)] = {
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    (0 until nDocs).map(i => (i.toLong,
      docGen.apply(Gen.Parameters.default, Seed(seedBase + i)).getOrElse("")))
  }

  test("span removal invariants on random corpora: every doc returned " +
      "once, kept+removed = input tokens, output is an ordered " +
      "subsequence of the input") {
    import graft.operators.Dedup
    val corpus = randomCorpus(7L, 40)
    val df = corpus.toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(df, "doc_id", "text", k = 4)
      .as[(Long, String, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq === corpus.map(_._1).sorted)
    val byId = corpus.toMap
    out.foreach { case (id, clean, kept, removed) =>
      val inToks = byId(id).trim.split("\\s+").filter(_.nonEmpty).toSeq
      val outToks =
        if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
      assert(kept === outToks.size, s"doc $id n_kept")
      assert(kept + removed === inToks.size, s"doc $id totals")
      // ordered-subsequence check: each kept token consumes the earliest
      // matching input position
      var pos = 0
      outToks.foreach { t =>
        val at = inToks.indexOf(t, pos)
        assert(at >= 0, s"doc $id: '$t' not a subsequence token")
        pos = at + 1
      }
    }
    // determinism across runs
    val again = Dedup.removeDuplicatedSpans(df, "doc_id", "text", k = 4)
      .as[(Long, String, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("hammingJoin64 equals brute force on random signature clouds at " +
      "every radius tier (0, 3, 7, 11, 15)") {
    import graft.operators.Dedup
    // clustered cloud: base points plus mutations at mixed distances, so
    // every tier has matches and non-matches
    val rnd = new scala.util.Random(31L)
    val bases = Seq.fill(6)(rnd.nextLong())
    def mutate(h: Long, flips: Int): Long = {
      var x = h
      rnd.shuffle((0 until 64).toList).take(flips)
        .foreach(b => x ^= 1L << b)
      x
    }
    val left = (0 until 30).map(i =>
      (i.toLong, mutate(bases(i % bases.size), rnd.nextInt(10))))
    val right = (0 until 30).map(i =>
      (1000L + i, mutate(bases(i % bases.size), rnd.nextInt(10))))
    val lDf = left.toDF("lid", "h")
    val rDf = right.toDF("rid", "h")
    for (r <- Seq(0, 3, 7, 11, 15)) {
      val got = Dedup.hammingJoin64(lDf, "lid", rDf, "rid", "h", r)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val want = (for {
        (li, lh) <- left; (ri, rh) <- right
        if java.lang.Long.bitCount(lh ^ rh) <= r
      } yield (li, ri)).toSet
      assert(got === want, s"radius $r: ${got.size} vs ${want.size}")
    }
  }

  test("DSIR: n_feats = tokens − 1 for every scored doc; weights stable " +
      "under repartitioning") {
    import graft.operators.Dsir
    val corpus = randomCorpus(99L, 30).filter(_._2.trim.nonEmpty)
    val df = corpus.toDF("doc_id", "text")
    val target = df.filter(col("doc_id") % 3 === 0)
    val w = Dsir.importanceWeights(df, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val byId = corpus.toMap
    w.foreach { case (id, nf, _) =>
      val n = byId(id).toLowerCase.trim.split("\\s+").count(_.nonEmpty)
      assert(nf === n - 1, s"doc $id n_feats")
    }
    assert(w.map(_._1).toSet ===
      corpus.filter(_._2.trim.split("\\s+").count(_.nonEmpty) >= 2)
        .map(_._1).toSet)
    val w2 = Dsir.importanceWeights(df.repartition(7), target, "doc_id",
        "text").as[(Long, Long, Double)].collect().sortBy(_._1)
    w.zip(w2).foreach { case ((i1, n1, x1), (i2, n2, x2)) =>
      assert(i1 === i2 && n1 === n2)
      assert(math.abs(x1 - x2) < 1e-9, s"doc $i1 weight drift")
    }
  }

  test("funnel: prefix monotonicity and strictly increasing stage times " +
      "on random event streams") {
    import graft.operators.Funnel
    val types = Vector("A", "B", "C")
    val evGen = Gen.zip(Gen.chooseNum(1, 8), Gen.oneOf(types),
      Gen.chooseNum(0, 5000))
    val events = (0 until 300).flatMap(i =>
        evGen.apply(Gen.Parameters.default, Seed(1000L + i)))
      .map { case (u, t, s) =>
        (u.toLong, t, new java.sql.Timestamp(1700000000000L + s * 1000L)) }
      .toDF("user_id", "et", "ts")
    val steps = Seq("a" -> (col("et") === "A"), "b" -> (col("et") === "B"),
      "c" -> (col("et") === "C"))
    val full = Funnel.funnel(events, "user_id", "ts", steps)
      .as[(Long, Option[java.sql.Timestamp], Option[java.sql.Timestamp],
        Option[java.sql.Timestamp], Int)].collect()
    // stage times strictly increase where present
    full.foreach { case (u, ta, tb, tc, n) =>
      assert(ta.nonEmpty, s"user $u entered without t_a")
      tb.foreach(t => assert(t.after(ta.get), s"user $u t_b"))
      (tb, tc) match {
        case (Some(b), Some(c)) => assert(c.after(b), s"user $u t_c")
        case (None, Some(_)) => fail(s"user $u skipped a stage")
        case _ =>
      }
      assert(n === Seq(ta, tb, tc).count(_.nonEmpty))
    }
    // a shorter prefix can only keep MORE users at its last stage
    val two = Funnel.funnel(events, "user_id", "ts", steps.take(2))
      .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp], Int)]
      .collect()
    assert(two.count(_._3.nonEmpty) >= full.count(_._4.nonEmpty))
    // and the two-step times agree with the three-step run's prefix
    val fullMap = full.map(r => r._1 -> ((r._2, r._3))).toMap
    two.foreach { case (u, ta, tb, _) =>
      assert(fullMap(u) === ((Some(ta), tb)), s"user $u prefix mismatch")
    }
  }

  test("label store law: after every random batch, flat and partitioned " +
      "layouts hold identical labels, and both equal the one-shot " +
      "closure over all edges so far") {
    import graft.operators.Components
    val base = java.nio.file.Files.createTempDirectory("label_prop")
    val flat = base.resolve("flat").toString
    val part = base.resolve("part").toString
    // random edge batches over a small id space: forces every regime —
    // fresh components, growth, cross-component merges, replays
    val gen = Gen.listOfN(4,
      Gen.zip(Gen.choose(1L, 40L), Gen.choose(1L, 40L)))
    val batches = samples(gen, 12)
    var allEdges = Seq.empty[(Long, Long)]
    batches.zipWithIndex.foreach { case (raw, i) =>
      val b = raw.filter { case (a, x) => a != x } // self-loops excluded
      if (b.nonEmpty) {
        allEdges ++= b
        Components.updateLabelStore(spark, flat,
          b.toDF("id_a", "id_b"), "id_a", "id_b")
        Components.updateLabelStore(spark, part,
          b.toDF("id_a", "id_b"), "id_a", "id_b", partitions = 8)
        val f = Components.readLabelStore(spark, flat)
          .as[(Long, Long)].collect().toMap
        val p = Components.readLabelStore(spark, part)
          .as[(Long, Long)].collect().toMap
        assert(p === f, s"layouts diverged after batch $i")
        val oneShot = Components.connectedComponents(
            allEdges.toDF("id_a", "id_b"), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        assert(f === oneShot,
          s"incremental != one-shot closure after batch $i")
      }
    }
    // a partitioned store never carries duplicate ids (the stale-
    // partition removal law)
    val ids = spark.read.parquet(part).select("id").as[Long].collect()
    assert(ids.length === ids.distinct.length,
      "duplicate id rows — a stale partition survived a rewrite")
  }

  test("partitioned label store: a crash between the data overwrite and " +
      "the emptied-partition removal leaves the documented duplicate-" +
      "label window, and the retried update heals it to the closure") {
    import graft.operators.Components
    import org.apache.spark.sql.types.LongType
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    val base = java.nio.file.Files.createTempDirectory("label_crash")
    val part = base.resolve("part").toString
    val P = 8
    def lpOf(c: Long): Int = java.lang.Math.floorMod(
      XxHash64Function.hash(c, LongType, 42L), P.toLong).toInt
    // a second component whose partition DIFFERS from component 1's —
    // the emptied-partition case needs the loser's rows to actually
    // relocate across partitions
    val c2 = (10L to 100L).find(c => lpOf(c) != lpOf(1L)).get
    Components.updateLabelStore(spark, part,
      Seq((1L, 2L), (c2, c2 + 1)).toDF("id_a", "id_b"), "id_a", "id_b",
      partitions = P)
    val loserDir = new java.io.File(part, s"lp=${lpOf(c2)}")
    assert(loserDir.exists(), "fixture: c2's component must have its own " +
      "partition before the merge")
    // snapshot the partition that the merge will empty and remove
    val backup = java.nio.file.Files.createTempDirectory("label_bk").toFile
    def copyDir(from: java.io.File, to: java.io.File): Unit = {
      to.mkdirs()
      Option(from.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.isDirectory) copyDir(f, new java.io.File(to, f.getName))
        else java.nio.file.Files.copy(f.toPath,
          new java.io.File(to, f.getName).toPath)
      }
    }
    copyDir(loserDir, backup)
    // the merge relabels c2's members into component 1: the loser
    // partition gets ZERO output rows, so the update writes the new
    // data and then explicitly removes the emptied partition — the
    // two-step whose non-atomicity is under test
    val merge = Seq((2L, c2 + 1)).toDF("id_a", "id_b")
    Components.updateLabelStore(spark, part, merge, "id_a", "id_b",
      partitions = P)
    assert(!loserDir.exists(), "the emptied partition must be removed " +
      "by a completed update")
    val healed = Components.readLabelStore(spark, part)
      .as[(Long, Long)].collect().toMap
    assert(healed ===
      Map(1L -> 1L, 2L -> 1L, c2 -> 1L, (c2 + 1) -> 1L))
    // CRASH SIMULATION: restore the stale partition exactly as a crash
    // after the dynamic overwrite but before the removal would leave it
    copyDir(backup, loserDir)
    val ids = spark.read.parquet(part).select("id").as[Long].collect()
    assert(ids.length > ids.distinct.length,
      "the window must be OBSERVABLE: relocated ids labeled twice " +
        "(old component in the stale partition, new in the winner's)")
    // the documented recovery: replaying the SAME batch re-derives the
    // same labels, re-touches the stale component's partition (its
    // stale rows still name the old component) and re-deletes it
    Components.updateLabelStore(spark, part, merge, "id_a", "id_b",
      partitions = P)
    assert(!loserDir.exists(), "retry must re-remove the stale partition")
    val after = Components.readLabelStore(spark, part)
      .as[(Long, Long)].collect()
    assert(after.map(_._1).distinct.length === after.length,
      "no duplicate labels after the healing replay")
    assert(after.toMap === healed, "healed labels must equal the closure")
  }

  test("kmv laws: insert-fold and pairwise merge both equal the reference " +
      "bottom-k (sorted distinct unsigned, take k) on random long streams " +
      "including sign-boundary values") {
    import graft.sources.SketchSidecar
    // reference: the k smallest distinct values in UNSIGNED order
    def ref(xs: Seq[Long], k: Int): Seq[Long] =
      xs.distinct.sortWith(java.lang.Long.compareUnsigned(_, _) < 0).take(k)
    val boundary = Gen.oneOf(0L, 1L, -1L, Long.MaxValue, Long.MinValue,
      Long.MaxValue - 1, Long.MinValue + 1)
    val anyLong = Gen.frequency(
      3 -> Gen.choose(Long.MinValue, Long.MaxValue),
      1 -> boundary,
      2 -> Gen.choose(-50L, 50L)) // force duplicates
    // k ≥ 3: the (k−1)/θ estimator is degenerate below that (Cfg
    // enforces kmvK ≥ 16 — the merge/insert laws hold for any k, and
    // they are exercised across the whole range regardless)
    val streams = samples(
      Gen.zip(Gen.choose(3, 48), Gen.listOfN(120, anyLong)), 30)
    streams.foreach { case (k, xs) =>
      val folded = xs.foldLeft(Array.emptyLongArray)(
        (b, h) => SketchSidecar.kmvInsert(b, h, k))
      assert(folded.toSeq === ref(xs, k), s"insert-fold k=$k")
      // arbitrary split, sketch each side, merge — must equal the
      // whole-stream sketch (the mergeability law the sidecar relies on)
      val (l, r) = xs.splitAt(xs.length / 3)
      val merged = SketchSidecar.kmvMergeArrays(
        l.foldLeft(Array.emptyLongArray)(
          (b, h) => SketchSidecar.kmvInsert(b, h, k)),
        r.foldLeft(Array.emptyLongArray)(
          (b, h) => SketchSidecar.kmvInsert(b, h, k)), k)
      assert(merged.toSeq === ref(xs, k), s"split-merge k=$k")
      // estimate sanity: exact when not full, positive and finite when full
      val est = SketchSidecar.kmvEstimate(folded, k)
      if (folded.length < k) assert(est === xs.distinct.length.toDouble)
      else assert(est > 0.0 && java.lang.Double.isFinite(est))
    }
  }
}
