package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SketchSidecar

/** The heavy-hitters face of the sketch sidecar: per-batch CMS + exact
  * top-k candidates, merged serve, and the four guarantees (completeness,
  * no under-count, bounded over-count, soundness). The HLL/quantile face
  * is covered in CorpusPipelineSpec (corpus-loop integration) and by the
  * q_sketch_sidecar_gap twin.
  */
class SketchSidecarSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshCfg(topK: Int = 32): SketchSidecar.Cfg =
    SketchSidecar.Cfg(
      Files.createTempDirectory("sketch_hh").resolve("sc").toString,
      distinctExpr = "id", valueExpr = "id",
      heavyKeyExpr = Some("key"), topK = topK)

  test("heavy hitters: planted shares surface at their thresholds; " +
      "estimates never under-count and over-count within eps*N") {
    val cfg = freshCfg()
    // 3 batches, 400 rows total: "hot" 55%, "warm" 25%, 80 distinct rares
    var id = 0L
    def rows(spec: Seq[(String, Int)]): Seq[(Long, String)] =
      spec.flatMap { case (k, c) => (1 to c).map { _ => id += 1; (id, k) } }
    val batches = Seq(
      rows(Seq("hot" -> 80, "warm" -> 30) ++
        (1 to 20).map(i => s"r$i" -> 1)),
      rows(Seq("hot" -> 70, "warm" -> 40) ++
        (21 to 50).map(i => s"r$i" -> 1)),
      rows(Seq("hot" -> 70, "warm" -> 30) ++
        (51 to 80).map(i => s"r$i" -> 1)))
    batches.foreach(b =>
      SketchSidecar.appendBatch(b.toDF("id", "key"), cfg))
    val all = batches.flatten
    val n = all.length.toDouble
    def servedKeys(phi: Double): Seq[String] =
      SketchSidecar.servedHeavyHitters(spark, cfg.sidecarPath, phi)
        .select("key").as[String].collect().toSeq
    assert(servedKeys(0.5) === Seq("hot"))
    assert(servedKeys(0.2) === Seq("hot", "warm"))
    assert(servedKeys(0.04).toSet === Set("hot", "warm"),
      "rares (each 0.25%) must stay below a 4% bar")
    // bound checks over EVERY candidate
    val est = SketchSidecar
      .servedHeavyHitters(spark, cfg.sidecarPath, 1e-12)
      .select("key", "est").as[(String, Long)].collect().toMap
    val exact = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    est.foreach { case (k, e) =>
      assert(e >= exact(k), s"CMS under-counted $k: $e < ${exact(k)}")
      assert(e <= exact(k) + cfg.cmsEps * n,
        s"CMS over-count beyond eps*N for $k")
    }
  }

  test("heavy hitters: a key spread thin across every batch still enters " +
      "the candidate set when topK >= 1/phi (completeness is structural, " +
      "not luck)") {
    // topK = 4, phi = 0.25: "spread" holds share exactly 0.25 of every
    // batch but is top-4 nowhere by COUNT alone unless the completeness
    // argument holds — each batch gives 3 keys a higher count, so spread
    // is rank 4 everywhere: the last guaranteed candidate slot
    val cfg = freshCfg(topK = 4)
    var id = 0L
    def rows(spec: Seq[(String, Int)]): Seq[(Long, String)] =
      spec.flatMap { case (k, c) => (1 to c).map { _ => id += 1; (id, k) } }
    // per batch: a=30, b=28, c=26, spread=30, fillers=6 → n_b=120;
    // spread share = 0.25 per batch and overall
    val mk = (i: Int) => rows(Seq(s"a$i" -> 30, s"b$i" -> 28, s"c$i" -> 26,
      "spread" -> 30) ++ (1 to 6).map(j => s"f$i$j" -> 1))
    (1 to 3).foreach(i =>
      SketchSidecar.appendBatch(mk(i).toDF("id", "key"), cfg))
    val served = SketchSidecar
      .servedHeavyHitters(spark, cfg.sidecarPath, phi = 0.25)
      .select("key").as[String].collect().toSeq
    assert(served === Seq("spread"),
      s"only 'spread' holds 25% of the whole corpus: $served")
  }

  test("compactRows: many batch rows merge to one; HLL and CMS serve " +
      "IDENTICALLY, quantiles stay within one extra 1/K of rank, appends " +
      "keep landing afterwards") {
    val cfg = freshCfg()
    val rnd = new scala.util.Random(11)
    var id = 0L
    def batch(hotShare: Int): Seq[(Long, String, Long)] =
      (1 to 100).map { _ =>
        id += 1
        val key = if (rnd.nextInt(100) < hotShare) "hot"
          else s"k${rnd.nextInt(40)}"
        (id, key, rnd.nextInt(1000).toLong)
      }
    val hhCfg = cfg.copy(distinctExpr = "id", valueExpr = "v")
    val batches = (1 to 6).map(_ => batch(40))
    batches.foreach(b =>
      SketchSidecar.appendBatch(b.toDF("id", "key", "v"), hhCfg))
    def dist() = SketchSidecar.servedDistinct(spark, cfg.sidecarPath)
      .collect().head.getLong(1)
    def hh() = SketchSidecar
      .servedHeavyHitters(spark, cfg.sidecarPath, 0.2)
      .select("key", "est").as[(String, Long)].collect().toSeq
    def p50() = SketchSidecar
      .servedQuantiles(spark, cfg.sidecarPath, Seq(0.5))
      .collect().head.getDouble(1)
    val (dBefore, hhBefore, p50Before) = (dist(), hh(), p50())
    assert(spark.read.parquet(cfg.sidecarPath).count() === 6)
    SketchSidecar.compactRows(spark, hhCfg)
    assert(spark.read.parquet(cfg.sidecarPath).count() === 1,
      "six rows must merge to one")
    // associative register/cell merges: estimates are exactly equal
    assert(dist() === dBefore)
    assert(hh() === hhBefore)
    // re-bucketing adds at most 1/K of rank: verify realized rank of the
    // new p50 against the raw values
    val values = batches.flatten.map(_._3.toDouble).sorted
    val n = values.length
    val v = p50()
    val lt = values.count(_ < v); val le = values.count(_ <= v)
    val err = math.max(0.0,
      math.max((lt + 1).toDouble / n - 0.5, 0.5 - le.toDouble / n)) -
      1.0 / n
    val bound = 3.0 / hhCfg.numBuckets + 1.0 / hhCfg.accuracy + 1e-9
    assert(err <= bound, s"p50 $v (was $p50Before) rank excess $err")
    // the loop continues: a fresh append lands NEXT to the merged row
    // and both contribute to the serve
    SketchSidecar.appendBatch(
      (1 to 50).map(i => (10000L + i, "newkey", 5000L))
        .toDF("id", "key", "v"), hhCfg)
    assert(spark.read.parquet(cfg.sidecarPath).count() === 2)
    assert(dist() > dBefore, "new ids must register")
    val hhAfter = SketchSidecar
      .servedHeavyHitters(spark, cfg.sidecarPath, 0.05)
      .select("key").as[String].collect().toSet
    assert(hhAfter.contains("newkey") && hhAfter.contains("hot"))
  }

  test("compactRows survives a sidecar whose rows all carry null " +
      "quantile summaries (all-null valueExpr batches)") {
    val cfg = SketchSidecar.Cfg(
      Files.createTempDirectory("sketch_nullqs").resolve("sc").toString,
      distinctExpr = "id", valueExpr = "v")
    val nullV = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("id", "v")
    SketchSidecar.appendBatch(nullV, cfg)
    SketchSidecar.appendBatch(nullV, cfg)
    SketchSidecar.compactRows(spark, cfg) // must not NPE
    val row = spark.read.parquet(cfg.sidecarPath)
    assert(row.count() === 1)
    assert(row.select("qs").collect().head.isNullAt(0))
    // distinct serving still works off the merged row
    assert(SketchSidecar.servedDistinct(spark, cfg.sidecarPath)
      .collect().head.getLong(1) === 2L)
  }

  test("heavy-hitter columns are absent when heavyKeyExpr is unset, and " +
      "serving from such a sidecar fails loudly") {
    val cfg = SketchSidecar.Cfg(
      Files.createTempDirectory("sketch_nohh").resolve("sc").toString,
      distinctExpr = "id", valueExpr = "id")
    SketchSidecar.appendBatch(
      (1L to 10L).map(i => (i, s"k$i")).toDF("id", "key"), cfg)
    val cols = spark.read.parquet(cfg.sidecarPath).columns.toSet
    assert(!cols.contains("cms") && !cols.contains("topk"))
    intercept[org.apache.spark.sql.AnalysisException] {
      SketchSidecar.servedHeavyHitters(spark, cfg.sidecarPath, 0.1)
        .collect()
    }
  }
}
