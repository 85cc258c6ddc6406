package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{CorpusPipeline, Watermark}

/** The daily corpus-builder loop end to end: bootstrap, cross-batch dedup
  * via the index, within-batch dedup, watermark advance, no-op rerun.
  */
class CorpusPipelineSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the old stone bridge " +
    "while rain falls softly on the quiet village below the tall mountains"
  private val nearDup = base.replace("quiet", "silent")
  private val fresh2 =
    "completely different content about database engines and distributed " +
    "query processing with columnar storage formats and shuffle services"

  test("two batches: near-dups of indexed docs are dropped, fresh docs land") {
    val dir = Files.createTempDirectory("corpus")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val wm = dir.resolve("wm.json").toString
    def pipeline = new CorpusPipeline(spark, src, corpus, idx, wm)

    // batch 1: one doc + an exact within-batch copy → bootstrap keeps 1
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), base),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), base))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(src)
    val r1 = pipeline.run()
    assert(r1.rowsWritten === 1)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))
    assert(Watermark.read(wm).get.startsWith("2024-01-01 01"))

    // batch 2: a near-dup of the INDEXED doc 1 plus a genuinely new doc —
    // only the new doc may land, but the watermark covers both
    Seq((3L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), nearDup),
        (4L, java.sql.Timestamp.valueOf("2024-01-02 01:00:00"), fresh2))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(src)
    val r2 = pipeline.run()
    assert(r2.rowsWritten === 1)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 4L))
    assert(Watermark.read(wm).get.startsWith("2024-01-02 01"))

    // rerun with nothing new: C3 short-circuit
    val r3 = pipeline.run()
    assert(r3.rowsWritten === 0)
    assert(spark.read.parquet(corpus).count() === 2)

    // the index now answers for BOTH corpus generations
    val probe = Seq((9L, fresh2)).toDF("doc_id", "text")
    val hits = graft.operators.Dedup
      .dedupAgainstIndex(probe, "doc_id", "text", idx, 0.8)
      .as[(Long, Long, Double)].collect()
    assert(hits.map(_._2).toSeq === Seq(4L))
  }

  test("quality gates run before the dedup gate; watermark still covers " +
      "gate-failed docs") {
    import graft.functions.TextAnalysis
    val dir = Files.createTempDirectory("corpus_gated")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val wm = dir.resolve("wm.json").toString
    val gates = Seq(
      "tokens" -> (TextAnalysis.tokenCount(col("text")) >= 8),
      "lang" -> (TextAnalysis.langId(col("text")) === "en"))
    def pipeline = new CorpusPipeline(spark, src, corpus, idx, wm,
      gates = gates)

    // one good doc, one too-short doc, one German doc (latest ts)
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), base),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "too short"),
        (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"),
          "der hund und die katze ist nicht mit das ein haus der garten"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(src)
    val r1 = pipeline.run()
    assert(r1.rowsWritten === 1)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))
    // watermark advanced past the REJECTED doc's ts — gate failures are
    // processed, not retried forever
    assert(Watermark.read(wm).get.startsWith("2024-01-01 02"))
    val r2 = pipeline.run()
    assert(r2.rowsWritten === 0)
  }

  test("decontamination gate drops docs sharing a benchmark n-gram " +
      "before they reach the corpus") {
    val dir = Files.createTempDirectory("corpus_decon")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val wm = dir.resolve("wm.json").toString
    val benchDir = dir.resolve("bench").toString
    // the benchmark contains base's opening 8-gram verbatim
    Seq((100L, base.split(" ").take(12).mkString(" ")))
      .toDF("doc_id", "text").write.parquet(benchDir)
    val pipeline = new CorpusPipeline(spark, src, corpus, idx, wm,
      benchmarkPath = Some(benchDir))
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), base),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), fresh2))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(src)
    val r = pipeline.run()
    // doc 1 is contaminated (contains the benchmark 8-gram), doc 2 lands
    assert(r.rowsWritten === 1)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(2L))
    assert(Watermark.read(wm).get.startsWith("2024-01-01 01"))
  }

  test("corpus loop maintains an ANN index alongside the dedup index: " +
      "bootstrap on batch 1, append batch 2 with frozen sidecars, serve both") {
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("corpus_ann")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ann = dir.resolve("ann").toString
    val wm = dir.resolve("wm.json").toString
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val v1 = vec(); val v2 = vec(); val v3 = vec()
    // minTrainRows = 1: batch 1's two docs reach the training mass, so the
    // sidecars freeze immediately and batch 2 must APPEND with them
    def pipeline = new CorpusPipeline(spark, src, corpus, idx, wm,
      embeddingCol = Some("embedding"), annIndexPath = Some(ann),
      annNlist = 2, annM = 8, annK = 8, annMinTrainRows = 1)

    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), base, v1),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), fresh2, v2))
      .toDF("doc_id", "ts", "text", "embedding")
      .write.mode("append").parquet(src)
    assert(pipeline.run().rowsWritten === 2)
    assert(new java.io.File(s"$ann/centroids").exists()) // bootstrapped
    val centsBefore = spark.read.parquet(s"$ann/centroids")
      .collect().map(_.toString).sorted.toSeq

    val extra = "a third document about entirely unrelated astronomy and " +
      "telescopes observing distant galaxies through clear winter skies"
    Seq((3L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), extra, v3))
      .toDF("doc_id", "ts", "text", "embedding")
      .write.mode("append").parquet(src)
    assert(pipeline.run().rowsWritten === 1)
    // append froze the sidecars (encoded comparably to batch 1)
    assert(spark.read.parquet(s"$ann/centroids")
      .collect().map(_.toString).sorted.toSeq === centsBefore)

    // the ONE maintained index serves vectors from BOTH batches
    val rawCorpus = spark.read.parquet(corpus)
    def top1(q: Array[Float]): Long =
      Similarity.ivfPqTopKFromIndex(spark, ann, rawCorpus,
          "doc_id", "embedding",
          Seq((0L, q)).toDF("vec_id", "embedding"), "embedding", 1,
          nprobe = 2, oversample = 4)
        .as[(Long, Double)].collect().head._1
    assert(top1(v1) === 1L)
    assert(top1(v3) === 3L)
  }

  test("perplexity gate: word-soup dropped against a FROZEN reference LM, " +
      "fluent doc lands, watermark covers both") {
    import graft.operators.Lm
    val dir = Files.createTempDirectory("corpus_lm")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val lmIdx = dir.resolve("lm").toString
    val wm = dir.resolve("wm.json").toString
    // frozen reference LM: repetitive fluent English (the curated-corpus
    // stand-in), built ONCE before any batch
    val reference = ((1L to 10L).map(i =>
      (i, base)) :+ (11L, fresh2)).toDF("doc_id", "text")
    Lm.writeLmIndex(reference, "text", lmIdx)

    val fluent = "the quick brown fox jumps over the lazy dog while rain " +
      "falls softly on the quiet village"
    val soup = "bridge fox the dog village quick softly mountains rain " +
      "lazy below stone jumps quiet the brown"
    // derive the gate threshold from the actual frozen-LM scores so the
    // test pins the ORDERING (fluent < soup), not absolute ppl values
    val ppls = Lm.perplexityAgainstIndex(
        Seq((1L, fluent), (2L, soup)).toDF("doc_id", "text"),
        "doc_id", "text", lmIdx)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(ppls(1L) < ppls(2L),
      s"fixture broken: fluent ${ppls(1L)} !< soup ${ppls(2L)}")
    val cut = (ppls(1L) + ppls(2L)) / 2

    val pipeline = new CorpusPipeline(spark, src, corpus, idx, wm,
      lmIndexPath = Some(lmIdx), lmMaxPpl = cut)
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), fluent),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), soup))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(src)
    val r = pipeline.run()
    assert(r.rowsWritten === 1)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))
    // the rejected doc is processed, not retried forever
    assert(Watermark.read(wm).get.startsWith("2024-01-01 01"))
    assert(pipeline.run().rowsWritten === 0)
  }

  test("DSIR gate: off-target doc dropped against a FROZEN importance " +
      "index, on-target doc lands, no-evidence doc passes") {
    import graft.operators.Dsir
    val dir = Files.createTempDirectory("corpus_dsir")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val dsIdx = dir.resolve("dsir").toString
    val wm = dir.resolve("wm.json").toString
    // frozen index: target = spark prose, raw = target + cooking prose —
    // both models fitted ONCE before any batch (the paper's convention)
    val target = Seq((100L, "spark shuffle join spark shuffle join"),
      (101L, "spark join shuffle spark join")).toDF("doc_id", "text")
    val rawSample = target.union(Seq(
      (200L, "bake flour sugar bake flour sugar"),
      (201L, "flour sugar bake flour")).toDF("doc_id", "text"))
    Dsir.writeDsirIndex(rawSample, target, "text", dsIdx)
    val onT = "spark shuffle join spark"
    val offT = "bake flour sugar bake"
    val ws = Dsir.weightsAgainstIndex(
        Seq((1L, onT), (2L, offT)).toDF("doc_id", "text"),
        "doc_id", "text", dsIdx)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(ws(1L) > ws(2L),
      s"fixture broken: on-target ${ws(1L)} !> off-target ${ws(2L)}")
    val cut = (ws(1L) + ws(2L)) / 2
    val pipeline = new CorpusPipeline(spark, src, corpus, idx, wm,
      dsirIndexPath = Some(dsIdx), dsirMinLogw = cut)
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), onT),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), offT),
        (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), "solo"))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(src)
    val r = pipeline.run()
    assert(r.rowsWritten === 2) // on-target + the no-evidence doc
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq.sorted === Seq(1L, 3L))
    assert(Watermark.read(wm).get.startsWith("2024-01-01 02"))
    assert(pipeline.run().rowsWritten === 0)
  }

  test("trained-classifier gate: low-quality doc dropped against a " +
      "FROZEN LR model sidecar, high-quality doc lands") {
    import graft.operators.Classifier
    val dir = Files.createTempDirectory("corpus_lr")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val model = dir.resolve("lr").toString
    val wm = dir.resolve("wm.json").toString
    // model trained ONCE on labeled prose before any batch, then frozen
    val labeled = ((0L until 30L).map(i =>
        (i, "clean curated prose data table row", 1)) ++
      (30L until 60L).map(i => (i, "spam junk click scam spam junk", 0)))
      .toDF("doc_id", "text", "y")
    Classifier.writeLrModel(
      Classifier.trainLogReg(labeled, "doc_id", "text", "y",
        buckets = 256, iterations = 25),
      buckets = 256, model)
    val good = "clean curated prose table"
    val bad = "spam junk click scam"
    val ps = Classifier.scoreAgainstModel(
        Seq((1L, good), (2L, bad)).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .select("doc_id", "p").as[(Long, Double)].collect().toMap
    assert(ps(1L) > ps(2L),
      s"fixture broken: good ${ps(1L)} !> bad ${ps(2L)}")
    val pipeline = new CorpusPipeline(spark, src, corpus, idx, wm,
      lrModelPath = Some(model), lrMinP = (ps(1L) + ps(2L)) / 2)
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), good),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), bad))
      .toDF("doc_id", "ts", "text").write.mode("append").parquet(src)
    val r = pipeline.run()
    assert(r.rowsWritten === 1)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))
    // the rejected doc is processed, not retried forever
    assert(Watermark.read(wm).get.startsWith("2024-01-01 01"))
    assert(pipeline.run().rowsWritten === 0)
  }

  test("ANN sidecar freeze boundary: recall immediately after the freeze " +
      "matches a full rebuild on the same corpus") {
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("corpus_freeze")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ann = dir.resolve("ann").toString
    val wm = dir.resolve("wm.json").toString
    val rnd = new scala.util.Random(13)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val vs = (1 to 7).map(_ => vec())
    val texts = Seq(
      "alpha document about mountain weather patterns and seasonal storms",
      "beta text concerning maritime navigation and coastal lighthouses",
      "gamma entry on medieval architecture and stone cathedral builders",
      "delta notes about orchestral composition and string instruments",
      "epsilon records of desert botany and succulent plant adaptations",
      "zeta survey of deep sea creatures and bioluminescent organisms",
      "eta review of ancient trade routes and silk road caravans")
    // minTrainRows = 4: batch 1 (3 docs) stays in the rebuild regime,
    // batch 2 (2 docs, corpus 5) rebuilds AND crosses the training mass,
    // batch 3 (2 docs) is the first FROZEN append — the boundary case
    def pipeline = new CorpusPipeline(spark, src, corpus, idx, wm,
      embeddingCol = Some("embedding"), annIndexPath = Some(ann),
      annNlist = 4, annM = 8, annK = 8, annMinTrainRows = 4)
    def feed(ids: Range, day: Int): Unit =
      ids.map(i => (i.toLong,
          java.sql.Timestamp.valueOf(f"2024-01-0$day 00:0$i:00"),
          texts(i - 1), vs(i - 1)))
        .toDF("doc_id", "ts", "text", "embedding")
        .write.mode("append").parquet(src)
    feed(1 to 3, 1); assert(pipeline.run().rowsWritten === 3)
    feed(4 to 5, 2); assert(pipeline.run().rowsWritten === 2)
    assert(spark.read.parquet(s"$ann/trained_meta")
      .as[Long].head() === 5L) // trained at the boundary crossing
    feed(6 to 7, 3); assert(pipeline.run().rowsWritten === 2)
    // still 5: batch 3 appended with FROZEN sidecars, no retrain
    assert(spark.read.parquet(s"$ann/trained_meta").as[Long].head() === 5L)

    // reference: a full rebuild over the SAME final corpus
    val rawCorpus = spark.read.parquet(corpus)
    val rebuilt = dir.resolve("rebuilt").toString
    Similarity.writeIvfPqIndex(rawCorpus, "doc_id", "embedding", rebuilt,
      nlist = 4, m = 8, k = 8, kmeansIters = 2)
    def top1(path: String, q: Array[Float]): Long =
      Similarity.ivfPqTopKFromIndex(spark, path, rawCorpus,
          "doc_id", "embedding",
          Seq((0L, q)).toDF("vec_id", "embedding"), "embedding", 1,
          nprobe = 2, oversample = 4)
        .as[(Long, Double)].collect().head._1
    // every corpus vector — batch-3's post-freeze appends included — must
    // resolve to itself through the frozen-sidecar index exactly as it
    // does through the rebuild: freezing must not cliff recall
    for (i <- 1 to 7) {
      assert(top1(ann, vs(i - 1)) === i.toLong, s"frozen index, doc $i")
      assert(top1(rebuilt, vs(i - 1)) === i.toLong, s"rebuilt index, doc $i")
    }
    // and a noisy near-neighbor probe of a post-freeze vector agrees
    val noisy = vs(6).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    assert(top1(ann, noisy) === top1(rebuilt, noisy))
  }

  test("SQ8 sidecar freeze boundary: frozen-params appends serve like " +
      "the built rows") {
    import graft.ingest.CorpusPipeline
    import graft.operators.Sq
    val dir = Files.createTempDirectory("corpus_sq")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val sqp = dir.resolve("sq").toString
    val rnd = new scala.util.Random(17)
    val vs = (1 to 6).map(_ => Array.fill(16)(rnd.nextGaussian().toFloat))
    val texts = Seq(
      "alpha document about mountain weather patterns and seasonal storms",
      "beta text concerning maritime navigation and coastal lighthouses",
      "gamma entry on medieval architecture and stone cathedral builders",
      "delta notes about orchestral composition and string instruments",
      "epsilon records of desert botany and succulent plant adaptations",
      "zeta survey of deep sea creatures and bioluminescent organisms")
    def batchDf(ids: Range) =
      ids.map(i => (i.toLong, texts(i - 1), vs(i - 1)))
        .toDF("doc_id", "text", "embedding")
    val cfg = CorpusPipeline.SqIndexCfg(sqp, "embedding", minTrainRows = 4)
    def run(ids: Range): Long = CorpusPipeline.dedupAndAppend(
      batchDf(ids), corpus, idx, "doc_id", "text", 0.8, sq = Some(cfg))
    assert(run(1 to 3) === 3) // rebuild regime
    assert(spark.read.parquet(s"$sqp/trained_meta").as[Long].head() === 3L)
    assert(run(4 to 5) === 2) // rebuild AND crosses minTrainRows
    assert(spark.read.parquet(s"$sqp/trained_meta").as[Long].head() === 5L)
    assert(run(6 to 6) === 1) // first FROZEN append
    assert(spark.read.parquet(s"$sqp/trained_meta").as[Long].head() === 5L)
    // every corpus vector — the post-freeze append included — resolves to
    // itself through the maintained index
    val queries = (1 to 6).map(i => (100L + i, vs(i - 1)))
      .toDF("vec_id", "embedding")
    val top1 = Sq.sqBatchTopKFromIndex(spark, sqp, "doc_id", "embedding",
        queries, "vec_id", "embedding", k = 1)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1 - 100L, r._2)).toMap
    for (i <- 1 to 6) assert(top1(i.toLong) === i.toLong, s"doc $i")
  }

  test("streaming corpus: checkpointed file stream drives the same gate") {
    import graft.streaming.CorpusStream
    val dir = Files.createTempDirectory("corpus_stream")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    def runOnce(): Unit = {
      val q = CorpusStream.start(spark, src, schema, corpus, idx, ckpt)
      q.awaitTermination() // AvailableNow drains the backlog and stops
    }

    // wave 1: doc + within-batch exact copy → one lands
    Seq((1L, base), (2L, base)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))

    // wave 2: near-dup of the indexed doc + a fresh doc → fresh only;
    // the checkpoint must NOT reprocess wave 1's files
    Seq((3L, nearDup), (4L, fresh2)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 4L))

    // rerun with no new files: checkpointed no-op
    runOnce()
    assert(spark.read.parquet(corpus).count() === 2)
  }

  test("streaming corpus maintains the sketch sidecar and exact-key " +
      "index per micro-batch") {
    import graft.streaming.CorpusStream
    import graft.sources.{BloomKeyIndex, SketchSidecar}
    val dir = Files.createTempDirectory("corpus_stream_sidecars")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    val sk = Some(SketchSidecar.Cfg(dir.resolve("sketch").toString,
      distinctExpr = "doc_id", valueExpr = "length(text)"))
    val keys = Some(BloomKeyIndex.Cfg(dir.resolve("keys").toString,
      keyExpr = "text", expectedItems = 4096L, numBits = 32768L))
    val labels = dir.resolve("dup_labels").toString
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    def runOnce(): Unit = {
      val q = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
        sketch = sk, exactKeys = keys, dupLabels = Some(labels))
      q.awaitTermination()
    }
    Seq((1L, base), (2L, fresh2)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    runOnce()
    // wave 2: exact re-delivery (new id, same text → the exact gate), a
    // NEAR-dup of the indexed doc 1 (passes the exact gate, dies at the
    // MinHash gate → a provenance pair), and one fresh doc
    Seq((3L, base), (5L, nearDup),
        (4L, "fresh wave about columnar file formats and " +
        "vectorized execution pipelines in modern analytic engines"))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L, 4L))
    // one sketch row per ADMITTED micro-batch, covering survivors only
    val ns = spark.read.parquet(sk.get.sidecarPath).select("n")
      .as[Long].collect().sorted.toSeq
    assert(ns === Seq(1L, 2L))
    assert(SketchSidecar.servedDistinct(spark, sk.get.sidecarPath)
      .collect().head.getLong(1) === 3L)
    // the exact-key index holds exactly the admitted texts
    assert(spark.read.parquet(s"${keys.get.indexPath}/keys")
      .count() === 3L)
    // the MinHash-gated near-dup left its provenance in the label store
    // (the exact-gate kill of doc 3 deliberately does not: the cheap
    // gate confirms membership, not WHICH document — see the dupLabels
    // parameter doc)
    assert(spark.read.parquet(labels).as[(Long, Long)].collect().toMap
      === Map(1L -> 1L, 5L -> 1L))
  }

  test("streaming corpus drives a GROUPED multi-face sketch sidecar and " +
      "a PARTITIONED provenance store through the gate chain") {
    import graft.streaming.CorpusStream
    import graft.sources.SketchSidecar
    import graft.operators.Components
    val dir = Files.createTempDirectory("corpus_stream_grouped")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    // grouped + KMV on ONE sidecar — the fused single-scan append
    // running inside the loop, per (micro-batch, source) row
    val sk = Some(SketchSidecar.Cfg(dir.resolve("sketch").toString,
      distinctExpr = "doc_id", valueExpr = "length(text)",
      groupKeyExpr = Some("source"), kmvKeyExpr = Some("doc_id"),
      kmvK = 64))
    val labels = dir.resolve("dup_labels").toString
    val funnel = dir.resolve("funnel").toString
    val ti = graft.sources.TextIndex.Cfg(
      dir.resolve("text_index").toString, partitions = 4)
    val schema = Seq((0L, "", "")).toDF("doc_id", "text", "source").schema
    def runOnce(): Unit = {
      val q = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
        sketch = sk, dupLabels = Some(labels), dupLabelsPartitions = 8,
        funnel = Some(funnel), textIndex = Some(ti))
      q.awaitTermination()
    }
    Seq((1L, base, "sa"), (2L, fresh2, "sb"))
      .toDF("doc_id", "text", "source")
      .write.mode("append").parquet(src)
    runOnce()
    Seq((5L, nearDup, "sa"),
        (4L, "fresh wave about columnar file formats and " +
        "vectorized execution pipelines in modern analytic engines", "sb"))
      .toDF("doc_id", "text", "source")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L, 4L))
    // one fused row per (admitted micro-batch, group): wave 1 admits
    // into sa and sb, wave 2's survivor is sb-only
    val rows = spark.read.parquet(sk.get.sidecarPath)
    assert(rows.count() === 3L)
    assert(rows.columns.contains("kmv") && rows.columns.contains("grp"))
    assert(SketchSidecar.servedDistinctByGroup(spark, sk.get.sidecarPath)
      .select("grp", "distinct_estimate").as[(String, Long)]
      .collect().toMap === Map("sa" -> 1L, "sb" -> 2L))
    assert(SketchSidecar
      .servedKmvDistinctByGroup(spark, sk.get.sidecarPath)
      .as[(String, Double)].collect().toMap ===
      Map("sa" -> 1.0, "sb" -> 2.0))
    // the provenance store was fed in its PARTITIONED layout by the
    // pipeline (the plumbed dupLabelsPartitions), and the point lookup
    // serves through it
    assert(new java.io.File(labels, "_label_partitions").exists())
    assert(Components.readLabelStore(spark, labels)
      .as[(Long, Long)].collect().toMap === Map(1L -> 1L, 5L -> 1L))
    assert(Components.lookupComponent(spark, labels, 5L) === Some(1L))
    // the stream stamps each funnel row with its checkpointed
    // micro-batch id — the log correlates to batches, not just sizes
    assert(spark.read.parquet(funnel)
      .select("batch_id", "n_arrived", "n_appended")
      .as[(Long, Long, Long)].collect().toSet ===
      Set((0L, 2L, 2L), (1L, 2L, 1L)))
    // the inverted text index rode the same micro-batches: the pruned
    // serve equals a scan of the corpus as it now stands, and the
    // dropped near-dup never entered the postings
    val scanBm = graft.operators.Keywords.bm25TopK(
        spark.read.parquet(corpus), "doc_id", "text",
        query = Seq("analytic"), k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(graft.sources.TextIndex.bm25TopK(spark, ti, "doc_id",
        Seq("analytic"), 10)
      .as[(Long, Double)].collect().toSeq === scanBm)
    assert(spark.read.parquet(s"${ti.indexPath}/postings")
      .select("doc_id").distinct().as[Long].collect().toSet ===
      Set(1L, 2L, 4L))
  }

  test("drift gate quarantines a JS-shifted micro-batch; in-distribution " +
      "batches land; metrics log both decisions") {
    import graft.streaming.{CorpusStream, DriftMonitor}
    import graft.operators.Divergence
    val dir = Files.createTempDirectory("corpus_stream_drift")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    val ref = dir.resolve("ref").toString
    val quar = dir.resolve("quarantine").toString
    val metrics = dir.resolve("metrics").toString
    // frozen reference distribution: English prose like the corpus docs
    Divergence.writeReferenceCounts(
      Seq((0L, base), (1L, fresh2)).toDF("doc_id", "text"), "text", ref)
    // threshold between the fixture's healthy JS (~0.04 — shared prose
    // vocabulary) and its shifted JS (~0.3 — disjoint vocabulary with
    // enough mass to dominate the add-one smoothing); js ∈ [0, ln 2]
    val gate = DriftMonitor.Gate(ref, maxJs = 0.15, quar, metrics)
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    def runOnce(): Unit = {
      val q = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
        drift = Some(gate))
      q.awaitTermination()
    }
    // wave 1: in-distribution (shares the reference vocabulary) → lands
    Seq((1L, base)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))
    // wave 2: the crawl breaks — disjoint token distribution (the
    // encoding-shift / spam-flood shape) → quarantined whole, corpus and
    // indexes untouched
    // token mass matters: repetition makes the disjoint counts dominate
    // the add-one smoothing, as a real spam flood would
    val garbled = (("zzqx wvvk pqzt mmnb rrdd zzqx wvvk pqzt ggfh jjkl " +
      "qqww eerr ttyy uuii oopp aass ddff gghh jjkk llzz xxcc vvbb ") * 25)
      .trim
    Seq((2L, garbled), (3L, garbled + " nnmm")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(corpus).count() === 1,
      "shifted batch must not reach the corpus")
    val q2 = spark.read.parquet(quar).select("doc_id").as[Long]
      .collect().toSet
    assert(q2 === Set(2L, 3L), "the whole shifted batch is the triage queue")
    // both decisions are in the append-only log, quarantined or not
    val log = spark.read.parquet(metrics)
      .select("batch_id", "js").as[(Long, Double)].collect().sortBy(_._1)
    assert(log.length === 2)
    assert(log.head._2 < 0.15 && log.last._2 > 0.15, log.mkString(", "))
    // wave 3: healthy again after the quarantine — the loop keeps going
    Seq((4L, fresh2)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    runOnce()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 4L))
  }

  test("streaming corpus maintains the ANN index across micro-batches") {
    import graft.streaming.CorpusStream
    import graft.ingest.CorpusPipeline
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("corpus_stream_ann")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ann = dir.resolve("ann").toString
    val ckpt = dir.resolve("ckpt").toString
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val v1 = vec(); val v2 = vec()
    val schema = Seq((0L, "", Array.empty[Float]))
      .toDF("doc_id", "text", "embedding").schema
    // minTrainRows = 2: wave 1 (one doc) stays in the REBUILD phase — a
    // 1-doc bootstrap would freeze degenerate sidecars — and wave 2
    // rebuilds over the 2-doc corpus, reaching the mass and freezing
    val annCfg = CorpusPipeline.AnnIndex(ann, "embedding",
      nlist = 2, m = 8, k = 8, minTrainRows = 2)
    def runOnce(): Unit = {
      val q = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
        ann = Some(annCfg))
      q.awaitTermination()
    }
    Seq((1L, base, v1)).toDF("doc_id", "text", "embedding")
      .write.mode("append").parquet(src)
    runOnce()
    Seq((2L, fresh2, v2)).toDF("doc_id", "text", "embedding")
      .write.mode("append").parquet(src)
    runOnce()
    val raw = spark.read.parquet(corpus)
    val top = Similarity.ivfPqTopKFromIndex(spark, ann, raw,
        "doc_id", "embedding",
        Seq((0L, v2)).toDF("vec_id", "embedding"), "embedding", 1,
        nprobe = 2, oversample = 4)
      .as[(Long, Double)].collect()
    assert(top.head._1 === 2L) // batch-2 vector served from the index
  }

  test("streaming corpus applies quality gates per micro-batch") {
    import graft.streaming.CorpusStream
    import graft.functions.TextAnalysis
    val dir = Files.createTempDirectory("corpus_stream_gated")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    Seq((1L, base), (2L, "too short")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
      gates = Seq("tokens" -> (TextAnalysis.tokenCount(col("text")) >= 8)))
    q.awaitTermination()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))
  }

  test("streaming corpus applies the frozen-LM perplexity gate per " +
      "micro-batch") {
    import graft.streaming.CorpusStream
    import graft.operators.Lm
    import graft.ingest.CorpusPipeline.LmGate
    val dir = Files.createTempDirectory("corpus_stream_lm")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val lmIdx = dir.resolve("lm").toString
    val ckpt = dir.resolve("ckpt").toString
    Lm.writeLmIndex(((1L to 10L).map(i => (i, base)) :+ (11L, fresh2))
      .toDF("doc_id", "text"), "text", lmIdx)
    val fluent = "the quick brown fox jumps over the lazy dog while rain " +
      "falls softly on the quiet village"
    val soup = "bridge fox the dog village quick softly mountains rain " +
      "lazy below stone jumps quiet the brown"
    val ppls = Lm.perplexityAgainstIndex(
        Seq((1L, fluent), (2L, soup)).toDF("doc_id", "text"),
        "doc_id", "text", lmIdx)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    Seq((1L, fluent), (2L, soup)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
      lm = Some(LmGate(lmIdx, (ppls(1L) + ppls(2L)) / 2)))
    q.awaitTermination()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))
  }

  test("streaming corpus applies the frozen DSIR gate per micro-batch") {
    import graft.ingest.CorpusPipeline.DsirGate
    import graft.operators.Dsir
    import graft.streaming.CorpusStream
    val dir = Files.createTempDirectory("corpus_stream_dsir")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val dsIdx = dir.resolve("dsir").toString
    val ckpt = dir.resolve("ckpt").toString
    val target = Seq((100L, "spark shuffle join spark shuffle join"),
      (101L, "spark join shuffle spark join")).toDF("doc_id", "text")
    Dsir.writeDsirIndex(
      target.union(Seq((200L, "bake flour sugar bake flour sugar"))
        .toDF("doc_id", "text")),
      target, "text", dsIdx)
    val onT = "spark shuffle join spark"
    val offT = "bake flour sugar bake"
    val ws = Dsir.weightsAgainstIndex(
        Seq((1L, onT), (2L, offT)).toDF("doc_id", "text"),
        "doc_id", "text", dsIdx)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    Seq((1L, onT), (2L, offT)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
      dsir = Some(DsirGate(dsIdx, (ws(1L) + ws(2L)) / 2)))
    q.awaitTermination()
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(1L))
  }

  // distinct-prose generator: docs far apart under MinHash so the dedup
  // gates pass everything through — these tests exercise maintenance, not
  // dedup decisions
  private def prose(i: Long): String =
    s"document $i covers subject${i} theme${i * 7} aspect${i * 13} " +
      s"detail${i * 17} note${i * 19} item${i * 23} point${i * 29} " +
      s"case${i * 31} part${i * 37} unit${i * 41} topic${i * 43}"

  test("compactEvery: 20 appended batches keep the index file count " +
      "bounded; serving unchanged by the maintenance pass") {
    import graft.ingest.CorpusPipeline.{AnnIndex, SqIndexCfg}
    import graft.operators.{Similarity, Sq}
    val dir = Files.createTempDirectory("corpus_compact_every")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ann = dir.resolve("ann").toString
    val sqp = dir.resolve("sq").toString
    val rnd = new scala.util.Random(5)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val planted = vec()
    def batch(b: Int) = {
      val docs = (0 until 4).map { j =>
        val id = b * 100L + j
        (id, prose(id), if (id == 100L) planted else vec())
      }
      docs.toDF("doc_id", "text", "embedding")
    }
    val annCfg = AnnIndex(ann, "embedding", nlist = 2, m = 8, k = 8,
      minTrainRows = 4, compactEvery = 5)
    val sqCfg = SqIndexCfg(sqp, "embedding", minTrainRows = 4,
      compactEvery = 5)
    (1 to 20).foreach { b =>
      CorpusPipeline.dedupAndAppend(batch(b), corpus, idx, "doc_id",
        "text", 0.8, ann = Some(annCfg), sq = Some(sqCfg),
        indexCompactEvery = 5)
    }
    def parquetFiles(root: java.io.File): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty)
            .filterNot(_.getName.startsWith(".")).map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(root)
    }
    // 19 frozen appends × (1 file per touched cell) would accumulate ~20+
    // files per cell without maintenance; the every-5 cadence bounds it
    val codeFiles = parquetFiles(new java.io.File(s"$ann/codes"))
    assert(codeFiles <= 12,
      s"codes table not compacted: $codeFiles files")
    val sqFiles = parquetFiles(new java.io.File(s"$sqp/data"))
    assert(sqFiles <= 8, s"sq data not compacted: $sqFiles files")
    // the MinHash gate index compacts on the same cadence — and the gate
    // still works: batch 21 re-sent must dedup fully against it
    val mhFiles = parquetFiles(new java.io.File(s"$idx/data"))
    assert(mhFiles <= 8, s"minhash index not compacted: $mhFiles files")
    val replay = CorpusPipeline.dedupAndAppend(batch(20), corpus, idx,
      "doc_id", "text", 0.8, ann = Some(annCfg), sq = Some(sqCfg),
      indexCompactEvery = 5)
    assert(replay === 0L, "replayed batch must match the compacted index")
    // the counter sidecar is invisible to Spark scans and survives
    assert(new java.io.File(s"$ann/_maint_appends").exists())
    // maintenance preserved the index contents: every appended doc's code
    // row is present exactly once, and the planted vector still serves
    val total = spark.read.parquet(corpus).count()
    assert(spark.read.parquet(s"$ann/codes").count() === total)
    assert(spark.read.parquet(s"$sqp/data").count() === total)
    val top = Similarity.ivfPqTopKFromIndex(spark, ann,
        spark.read.parquet(corpus), "doc_id", "embedding",
        Seq((0L, planted)).toDF("vec_id", "embedding"), "embedding", 1,
        nprobe = 2, oversample = 8)
      .as[(Long, Double)].collect()
    assert(top.head._1 === 100L, s"planted vector lost: ${top.toSeq}")
  }

  test("imbalance-triggered rebuild trains on a SAMPLE " +
      "(trainSampleFraction) and still restores serving") {
    import graft.ingest.CorpusPipeline.AnnIndex
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("corpus_recluster_sample")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ann = dir.resolve("ann").toString
    val dim = 16
    val rnd = new scala.util.Random(9)
    // direction clusters matched to the index's dot-product geometry
    def member(axis: Int, bias: Double = 0.0): Array[Float] = {
      val v = Array.fill(dim)(0.05f * rnd.nextGaussian().toFloat)
      v(axis) = v(axis) + 5f
      if (bias != 0.0) v(0) = v(0) + bias.toFloat
      v
    }
    val annCfg = AnnIndex(ann, "embedding", nlist = 4, m = 8, k = 8,
      kmeansIters = 2, minTrainRows = 8,
      reclusterImbalance = 1.4, trainSampleFraction = 0.5)
    // batch 1 (two balanced direction clusters, ids interleaved so the
    // deterministic seeds cover both directions) trains and freezes; an
    // 80-vector pile-up into one of ≤4 cells then pushes max/mean past
    // 1.4 whether the balanced build populated 2, 3, or 4 cells
    val b1 = (1 to 80).map(i =>
      (i.toLong, prose(i), member(i % 2)))
      .toDF("doc_id", "text", "embedding")
    CorpusPipeline.dedupAndAppend(b1, corpus, idx, "doc_id", "text", 0.8,
      ann = Some(annCfg))
    val trained1 = spark.read.parquet(s"$ann/trained_meta")
      .as[Long].head()
    assert(trained1 === 80L)
    // batch 2: a drifted THIRD direction with an e0 bias — the frozen
    // centroids pile it into one hot cell, tripping the imbalance
    // threshold, and the rebuild retrains on a 50% seeded sample
    val b2 = (101 to 180).map(i =>
      (i.toLong, prose(i), member(2, bias = 0.5)))
      .toDF("doc_id", "text", "embedding")
    CorpusPipeline.dedupAndAppend(b2, corpus, idx, "doc_id", "text", 0.8,
      ann = Some(annCfg))
    // the rebuild happened: trained_meta advanced to the full corpus size
    val trained2 = spark.read.parquet(s"$ann/trained_meta")
      .as[Long].head()
    assert(trained2 === 160L,
      s"imbalance rebuild did not run (trained_meta=$trained2)")
    // and the sample-trained geometry serves the drifted direction: a
    // query down e2 finds a drifted member with limited probing
    val top = Similarity.ivfPqTopKFromIndex(spark, ann,
        spark.read.parquet(corpus), "doc_id", "embedding",
        Seq((0L, member(2, bias = 0.5))).toDF("vec_id", "embedding"),
        "embedding", 3, nprobe = 2, oversample = 8)
      .as[(Long, Double)].collect()
    assert(top.forall(_._1 >= 101L),
      s"drifted cluster not recalled after sample rebuild: ${top.toSeq}")
  }

  test("quarantine triage: released under an updated reference, admitted " +
      "exactly once, still-divergent queue left in place") {
    import graft.streaming.{CorpusStream, DriftMonitor}
    import graft.operators.Divergence
    val dir = Files.createTempDirectory("corpus_triage")
    val src = dir.resolve("src").toString
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ckpt = dir.resolve("ckpt").toString
    val refA = dir.resolve("refA").toString
    val refB = dir.resolve("refB").toString
    val quar = dir.resolve("quarantine").toString
    val metrics = dir.resolve("metrics").toString
    // reference A: English prose — the vocabulary the gate was tuned for
    Divergence.writeReferenceCounts(
      Seq((0L, base), (1L, fresh2)).toDF("doc_id", "text"), "text", refA)
    val gate = DriftMonitor.Gate(refA, maxJs = 0.15, quar, metrics)
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    // wave 1 lands; wave 2 (disjoint vocabulary, spam-flood mass) is
    // quarantined under reference A
    val garbled = (("zzqx wvvk pqzt mmnb rrdd zzqx wvvk pqzt ggfh jjkl " +
      "qqww eerr ttyy uuii oopp aass ddff gghh jjkk llzz xxcc vvbb ") * 25)
      .trim
    Seq((1L, base)).toDF("doc_id", "text").write.mode("append").parquet(src)
    val q1 = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
      drift = Some(gate)); q1.awaitTermination()
    Seq((2L, garbled), (3L, garbled + " nnmm")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q2 = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
      drift = Some(gate)); q2.awaitTermination()
    assert(spark.read.parquet(quar).count() === 2)
    assert(spark.read.parquet(corpus).count() === 1)
    // a SECOND shifted batch with a disjoint vocabulary of its own — the
    // mixed-queue case per-batch triage exists for
    val garbled2 = (("foo1 bar2 baz3 qux4 quux5 foo1 bar2 baz3 corge6 " +
      "grault7 garply8 waldo9 fred0 plugh1 xyzzy2 thud3 foo1 bar2 ") * 25)
      .trim
    Seq((5L, garbled2)).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q3 = CorpusStream.start(spark, src, schema, corpus, idx, ckpt,
      drift = Some(gate)); q3.awaitTermination()
    assert(spark.read.parquet(quar).count() === 3,
      "both shifted batches must be queued")
    // triage under the SAME (stale) reference: both batches still
    // divergent → queue untouched, nothing admitted
    val still = CorpusStream.reprocessQuarantine(spark, quar, refA, 0.15,
      corpus, idx, metricsPath = Some(metrics))
    assert(still.batches === 2L && still.released === 0L &&
      still.admitted === 0L)
    assert(spark.read.parquet(quar).count() === 3, "queue must stay put")
    // the operator refits the reference to the FIRST shifted vocabulary
    // (that drift was real change, not breakage): per-batch re-gating
    // releases batch 1 only — pooled gating would have measured the
    // mixture and could decide either way for both
    Divergence.writeReferenceCounts(
      Seq((0L, garbled)).toDF("doc_id", "text"), "text", refB)
    val partial = CorpusStream.reprocessQuarantine(spark, quar, refB, 0.15,
      corpus, idx, metricsPath = Some(metrics))
    assert(partial.batches === 2L && partial.released === 1L,
      s"exactly the matching batch must clear: $partial")
    // of the released batch, doc 2 lands and doc 3 (its within-batch
    // near-dup) is deduped by the normal gate chain
    assert(partial.admitted === 1L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L))
    // the still-toxic batch survives the partial-release queue rewrite
    val held = spark.read.parquet(quar)
    assert(held.select("doc_id").as[Long].collect().toSeq === Seq(5L))
    // refit to the second vocabulary: the held batch clears, queue drains
    val refC = dir.resolve("refC").toString
    Divergence.writeReferenceCounts(
      Seq((0L, garbled2)).toDF("doc_id", "text"), "text", refC)
    val drained = CorpusStream.reprocessQuarantine(spark, quar, refC, 0.15,
      corpus, idx)
    assert(drained.batches === 1L && drained.released === 1L &&
      drained.admitted === 1L, s"$drained")
    assert(!new java.io.File(quar).exists(), "queue not drained")
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L, 5L))
    // exactly-once under retry: recreate the queue as a crash between the
    // appends and the queue rewrite would leave it (legacy untagged
    // layout — triages as one batch) — reprocessing admits 0 (every doc
    // matches its own indexed signatures) and drains cleanly
    Seq((2L, garbled), (3L, garbled + " nnmm")).toDF("doc_id", "text")
      .write.mode("append").parquet(quar)
    val retry = CorpusStream.reprocessQuarantine(spark, quar, refB, 0.15,
      corpus, idx)
    assert(retry.batches === 1L && retry.released === 1L &&
      retry.admitted === 0L, s"retry must dedup everything: $retry")
    assert(spark.read.parquet(corpus).count() === 3)
    // per-batch triage measurements are in the metrics log (2 from the
    // stale-reference attempt + 2 from the partial release), batch_id -1
    val triageRows = spark.read.parquet(metrics)
      .where(col("batch_id") === -1L).count()
    assert(triageRows === 4L)
  }

  test("adaptive gate from the sketch sidecar: the length cut tracks the " +
      "accepted corpus's own upper quartile — bootstrap passes, later " +
      "batches are judged by corpus history") {
    import graft.sources.SketchSidecar
    val dir = Files.createTempDirectory("corpus_adaptive")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val cfg = SketchSidecar.Cfg(dir.resolve("sketch").toString,
      distinctExpr = "doc_id", valueExpr = "length(text)")
    def text(i: Int, words: Int) =
      (1 to words).map(j => s"a${i}x$j").mkString(" ")
    def run(rows: Seq[(Long, String)]): Long = {
      // threshold read BEFORE the batch appends its own sketch row
      val thr = SketchSidecar.servedThreshold(spark, cfg.sidecarPath, 0.75)
      val gates = thr.toSeq.map(t =>
        "adaptive_len" -> (length(col("text")) >= t))
      CorpusPipeline.dedupAndAppend(rows.toDF("doc_id", "text"), corpus,
        idx, "doc_id", "text", 0.8, gates = gates, sketch = Some(cfg))
    }
    // bootstrap: no history, no adaptive gate — everything lands
    assert(SketchSidecar.servedThreshold(spark, cfg.sidecarPath, 0.75)
      .isEmpty)
    assert(run(Seq((1L, text(1, 10)), (2L, text(2, 30)))) === 2L)
    // the corpus's p75 length lands on the longer doc: a batch of
    // short docs is cut by the corpus's OWN distribution, not a
    // hand-frozen constant; a long doc passes
    val thr = SketchSidecar.servedThreshold(spark, cfg.sidecarPath, 0.75)
    assert(thr.nonEmpty && thr.get > text(1, 10).length &&
      thr.get <= text(2, 30).length, s"p75 threshold $thr")
    assert(run(Seq((3L, text(3, 10)), (4L, text(4, 35)))) === 1L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L, 4L))
    // and the sidecar accounts survivors only, so the threshold keeps
    // tracking the ACCEPTED corpus (now 3 docs)
    assert(spark.read.parquet(cfg.sidecarPath).count() === 2)
  }

  test("rowMergeEvery: the loop row-merges the sketch sidecar on its " +
      "cadence, serves survive, and appends keep landing after") {
    import graft.sources.SketchSidecar
    val dir = Files.createTempDirectory("corpus_rowmerge")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val cfg = SketchSidecar.Cfg(dir.resolve("sketch").toString,
      distinctExpr = "doc_id", valueExpr = "length(text)",
      rowMergeEvery = 2)
    def docsBatch(ids: Seq[Long]) = ids.map(i =>
      (i, (1 to 12).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    CorpusPipeline.dedupAndAppend(docsBatch(Seq(1L, 2L)), corpus, idx,
      "doc_id", "text", 0.8, sketch = Some(cfg))
    assert(spark.read.parquet(cfg.sidecarPath).count() === 1L)
    CorpusPipeline.dedupAndAppend(docsBatch(Seq(3L, 4L)), corpus, idx,
      "doc_id", "text", 0.8, sketch = Some(cfg))
    // second append hit the cadence: two rows merged to one
    assert(spark.read.parquet(cfg.sidecarPath).count() === 1L,
      "cadence must row-merge 2 batch rows into 1")
    assert(SketchSidecar.servedDistinct(spark, cfg.sidecarPath)
      .collect().head.getLong(1) === 4L)
    // the loop continues: the next append lands NEXT to the merged row
    CorpusPipeline.dedupAndAppend(docsBatch(Seq(5L)), corpus, idx,
      "doc_id", "text", 0.8, sketch = Some(cfg))
    assert(spark.read.parquet(cfg.sidecarPath).count() === 2L)
    assert(SketchSidecar.servedDistinct(spark, cfg.sidecarPath)
      .collect().head.getLong(1) === 5L)
  }

  test("media gate: payload near-dups of the indexed corpus and within " +
      "the batch are dropped before the text gate, fingerprints decode " +
      "once and append after the MinHash commit, replay admits nothing") {
    import graft.operators.Multimodal
    val dir = Files.createTempDirectory("corpus_media")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val mediaIdx = dir.resolve("media_index").toString
    val gate = Some(CorpusPipeline.MediaGate(mediaIdx, "img"))
    def text(i: Long) = (1 to 12).map(j => s"w${i}x$j").mkString(" ")
    def img(seed: Long) = Multimodal.syntheticNoisePng(seed, 18, 16)
    def run(rows: Seq[(Long, String, Array[Byte])]): Long =
      CorpusPipeline.dedupAndAppend(rows.toDF("doc_id", "text", "img"),
        corpus, idx, "doc_id", "text", 0.8, media = gate)
    assert(run(Seq((1L, text(1), img(1)), (2L, text(2), img(2)))) === 2L)
    assert(spark.read.parquet(mediaIdx).count() === 2L)
    // wave 2: doc 3 carries a RESIZE of doc 1's image (media near-dup
    // of the corpus — fresh text, so only the media gate can catch it);
    // docs 4/5 share one new image (within-batch media pair, lowest id
    // survives); doc 6 is genuinely fresh
    val wave2 = Seq((3L, text(3), Multimodal.upscaleNearest(img(1), 2)),
      (4L, text(4), img(7)), (5L, text(5), img(7)), (6L, text(6), img(9)))
    assert(run(wave2) === 2L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L, 4L, 6L))
    // the index holds exactly the survivors' fingerprints
    assert(spark.read.parquet(mediaIdx).select("media_id").as[Long]
      .collect().toSet === Set(1L, 2L, 4L, 6L))
    // replay: every row now matches its own indexed state through one
    // gate or the other — nothing double-appends
    assert(run(wave2) === 0L)
    assert(spark.read.parquet(corpus).count() === 4L)
  }

  test("gate funnel: one opt-in row per batch records the surviving " +
      "count after every stage") {
    import org.apache.spark.sql.functions.{col, length}
    val dir = Files.createTempDirectory("corpus_funnel")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val funnel = dir.resolve("funnel").toString
    def doc(i: Long) = (1 to 12).map(j => s"w${i}x$j").mkString(" ")
    val gates = Seq("len" -> (length(col("text")) > 30))
    CorpusPipeline.dedupAndAppend(
      Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text"),
      corpus, idx, "doc_id", "text", 0.8, gates = gates,
      funnel = Some(funnel))
    // wave 2: a quality kill ("short"), an index dup (doc 1's text), a
    // within-batch dup pair (5/6 share a text), one true fresh doc
    CorpusPipeline.dedupAndAppend(
      Seq((3L, "short"), (4L, doc(1)), (5L, doc(5)), (6L, doc(5)),
          (7L, doc(7))).toDF("doc_id", "text"),
      corpus, idx, "doc_id", "text", 0.8, gates = gates,
      funnel = Some(funnel))
    val rows = spark.read.parquet(funnel)
      .orderBy("n_arrived").collect()
    assert(rows.length === 2)
    // every row is stamped with its gate-chain execution time — the
    // replay discriminator consumers dedupe arrival events on
    assert(rows.forall(r => r.getLong(r.fieldIndex("attempt_ts")) > 0L))
    val w2 = rows.last.toSeq.zipWithIndex
      .collect { case (v, i) if i != rows.last.fieldIndex("attempt_ts") =>
        v.asInstanceOf[Long] }
    // batch_id −1 (plain loop), arrived 5 → quality kills doc 3 →
    // index dedup kills doc 4 → batch dedup collapses 5/6 → 2 appended;
    // unconfigured stages (exact/lm/dsir/classifier/decontamination/
    // media) pass everything through
    assert(w2 === Seq(-1L, 5L, 5L, 4L, 4L, 4L, 4L, 4L, 4L, 3L, 2L),
      s"funnel $w2")
    assert(spark.read.parquet(corpus).count() === 4L)
    // funnel rows are ARRIVAL EVENTS: a replayed gate-chain execution
    // writes a second row with the same batch_id, and the documented
    // latest-attempt window dedupes it back to a per-batch view
    CorpusPipeline.dedupAndAppend(
      Seq((3L, "short"), (4L, doc(1)), (5L, doc(5)), (6L, doc(5)),
          (7L, doc(7))).toDF("doc_id", "text"),
      corpus, idx, "doc_id", "text", 0.8, gates = gates,
      funnel = Some(funnel))
    val log = spark.read.parquet(funnel)
    assert(log.count() === 3L, "one row per execution, not per batch")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val perBatch = log.withColumn("__rn", row_number().over(
        Window.partitionBy("batch_id")
          .orderBy(col("attempt_ts").desc, col("n_appended"))))
      .where(col("__rn") === 1)
    assert(perBatch.count() === 1L)
    // the replay's row records the batch dropping entirely (every doc
    // now matches its own indexed signatures), which is the row the
    // latest-attempt view serves
    assert(perBatch.select("n_appended").as[Long].collect().head === 0L)
  }

  test("corpus loop maintains the inverted text index: the index-served " +
      "BM25 equals a corpus scan after every batch, dropped dups never " +
      "enter the postings, and a compaction cadence keeps files bounded") {
    import graft.sources.TextIndex
    val dir = Files.createTempDirectory("corpus_text_index")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val ti = TextIndex.Cfg(dir.resolve("ti").toString, partitions = 4,
      compactEvery = 2)
    def doc(i: Long) = (1 to 12)
      .map(j => if (j == 1) "probe" else s"w${i}x$j").mkString(" ")
    // batch 1: two docs; batch 2: an exact dup of doc 1 (must not enter
    // the postings) + a fresh doc; batch 3: fresh
    val batches = Seq(
      Seq((1L, doc(1)), (2L, doc(2))),
      Seq((3L, doc(1)), (4L, doc(4))),
      Seq((5L, doc(5))))
    batches.foreach { b =>
      CorpusPipeline.dedupAndAppend(b.toDF("doc_id", "text"),
        corpus, idx, "doc_id", "text", 0.8, textIndex = Some(ti))
      // the serve and the scan must agree after EVERY admitted batch —
      // the index is additive and dup-free exactly when the loop feeds
      // it survivors only
      val scan = graft.operators.Keywords.bm25TopK(
          spark.read.parquet(corpus), "doc_id", "text",
          query = Seq("probe"), k = 10)
        .as[(Long, Double)].collect().toSeq
      val served = TextIndex.bm25TopK(spark, ti, "doc_id",
          Seq("probe"), 10)
        .as[(Long, Double)].collect().toSeq
      assert(served === scan)
    }
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L, 4L, 5L))
    // dup doc 3 never entered: postings carry exactly the 4 survivors
    assert(spark.read.parquet(s"${ti.indexPath}/postings")
      .select("doc_id").distinct().as[Long].collect().toSet ===
      Set(1L, 2L, 4L, 5L))
    // compactEvery = 2 fired at least once: stats row-merged to <= 2 rows
    assert(spark.read.parquet(s"${ti.indexPath}/stats").count() <= 2L)
  }

  test("schema-drift gate: a batch whose schema renamed or retyped a " +
      "column is rejected loudly instead of appending a second schema " +
      "into the corpus; same columns in a different order pass") {
    val dir = Files.createTempDirectory("corpus_schema")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    def text(i: Int) = (1 to 15).map(j => s"s${i}w$j").mkString(" ")
    assert(CorpusPipeline.dedupAndAppend(
      Seq((1L, text(1), "web")).toDF("doc_id", "text", "source"),
      corpus, idx, "doc_id", "text", 0.8) === 1L)
    // renamed column: must fail loudly, corpus untouched
    val renamed = intercept[IllegalArgumentException] {
      CorpusPipeline.dedupAndAppend(
        Seq((2L, text(2), "web")).toDF("doc_id", "text", "src"),
        corpus, idx, "doc_id", "text", 0.8)
    }
    assert(renamed.getMessage.contains("schema drifted"))
    // retyped column: same failure
    intercept[IllegalArgumentException] {
      CorpusPipeline.dedupAndAppend(
        Seq((3, text(3), "web")).toDF("doc_id", "text", "source")
          .withColumn("doc_id", col("doc_id").cast("int")),
        corpus, idx, "doc_id", "text", 0.8)
    }
    assert(spark.read.parquet(corpus).count() === 1,
      "a rejected batch must leave the corpus untouched")
    // the check runs FIRST: a drifted batch must fail before the gate
    // chain commits anything for it — here the provenance store stays
    // absent even though the batch near-dups an indexed doc, and the
    // failure fires even though zero rows would have survived
    val labels = Files.createTempDirectory("schema_labels")
      .resolve("labels").toString
    intercept[IllegalArgumentException] {
      CorpusPipeline.dedupAndAppend(
        Seq((5L, text(1), "web")).toDF("doc_id", "text", "src"),
        corpus, idx, "doc_id", "text", 0.8, dupLabels = Some(labels))
    }
    assert(!new java.io.File(labels).exists(),
      "a drifted batch must not commit provenance edges")
    // column ORDER is not schema drift (parquet resolves by name)
    assert(CorpusPipeline.dedupAndAppend(
      Seq(("web", text(4), 4L)).toDF("source", "text", "doc_id"),
      corpus, idx, "doc_id", "text", 0.8) === 1L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 4L))
  }

  test("triage holds a batch whose gate chain fails terminally instead " +
      "of wedging: healthy batches drain, the failed batch rejoins the " +
      "live queue, the claim is cleaned") {
    import graft.streaming.CorpusStream
    import graft.operators.Divergence
    val dir = Files.createTempDirectory("triage_hold")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val quar = dir.resolve("quarantine").toString
    val ref = dir.resolve("ref").toString
    def text(i: Int) = (1 to 15).map(j => s"t${i}w$j").mkString(" ")
    assert(CorpusPipeline.dedupAndAppend(
      Seq((1L, text(1))).toDF("doc_id", "text"),
      corpus, idx, "doc_id", "text", 0.8) === 1L)
    // the reference accepts everything — only the gate chain's own
    // failure can hold a batch here
    Divergence.writeReferenceCounts(
      (1 to 40).map(i => (i.toLong, text(i))).toDF("doc_id", "text"),
      "text", ref)
    // batch 7 trips a terminally-failing gate (raise_error mid-job —
    // the stand-in for any exception the chain can throw, e.g. the
    // schema-drift require awaiting a corpus migration); batch 8 is
    // healthy
    Seq((7L, text(7) + " boom")).toDF("doc_id", "text")
      .withColumn("__q_batch", lit(7L))
      .write.mode("append").parquet(quar)
    Seq((8L, text(8))).toDF("doc_id", "text")
      .withColumn("__q_batch", lit(8L))
      .write.mode("append").parquet(quar)
    val explodingGate = Seq("no_boom" ->
      when(col("text").contains("boom"),
        raise_error(lit("poison batch"))).otherwise(lit(true)))
    val r = CorpusStream.reprocessQuarantine(spark, quar, ref,
      maxJs = 10.0, corpus, idx, gates = explodingGate)
    assert(r.batches === 2 && r.released === 1 && r.admitted === 1,
      s"healthy batch must drain while the failing one is held: $r")
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 8L))
    // the held batch is back in the LIVE queue, claim gone — a later
    // invocation (after the operator fixes the cause) can retry it
    assert(spark.read.parquet(quar)
      .select("doc_id").as[Long].collect().toSeq === Seq(7L))
    assert(!graft.sources.Compaction
      .stagingDir(new java.io.File(quar), "triage").exists())
  }

  test("corpus-table compaction on a cadence: file count stays bounded, " +
      "content is preserved, and the dedup gate still answers after the " +
      "swap") {
    val dir = Files.createTempDirectory("corpus_compact")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    def text(i: Int) = (1 to 15).map(j => s"c${i}w$j").mkString(" ")
    def run(rows: Seq[(Long, String)]): Long =
      CorpusPipeline.dedupAndAppend(rows.toDF("doc_id", "text"), corpus,
        idx, "doc_id", "text", 0.8, corpusCompactEvery = 2)
    def files(): Int = Option(new java.io.File(corpus).listFiles())
      .getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    (1 to 4).foreach(i => assert(run(Seq((i.toLong, text(i)))) === 1L))
    // two compactions fired (appends 2 and 4): the per-batch file sets
    // collapsed; without the cadence this directory holds >= 4 file sets
    assert(files() <= 2, s"expected compacted corpus, got ${files()} files")
    assert(new java.io.File(s"$corpus/_maint_appends").exists())
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    // the gate still drops a near-dup of a pre-compaction doc — the
    // rewrite is content-preserving for the index's view of the corpus
    assert(run(Seq((9L, text(1).replace("c1w7", "zzz")))) === 0L)
    assert(run(Seq((10L, text(10)))) === 1L)
  }

  test("dup-provenance label store: within-batch and vs-index pairs fold " +
      "into persisted components, an all-dup batch still records its " +
      "provenance, and a replayed batch changes nothing") {
    val dir = Files.createTempDirectory("corpus_prov")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val labels = dir.resolve("dup_labels").toString
    def run(rows: Seq[(Long, String)]): Long =
      CorpusPipeline.dedupAndAppend(rows.toDF("doc_id", "text"), corpus,
        idx, "doc_id", "text", 0.8, dupLabels = Some(labels))
    def stored(): Map[Long, Long] =
      spark.read.parquet(labels).as[(Long, Long)].collect().toMap
    // batch 1: doc 2 is an exact within-batch copy of doc 1 → pair (1,2)
    assert(run(Seq((1L, base), (2L, base))) === 1L)
    assert(stored() === Map(1L -> 1L, 2L -> 1L))
    // batch 2: doc 3 near-dups the INDEXED doc 1 (vs-index pair), doc 4
    // is fresh (no pair — must stay OUT of the store)
    assert(run(Seq((3L, nearDup), (4L, fresh2))) === 1L)
    assert(stored() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // batch 3: ALL dups (zero survivors) — exactly the batch whose
    // provenance matters most; the fold must run despite appended == 0
    val dup5 = base.replace("softly", "gently")
    assert(run(Seq((5L, dup5))) === 0L)
    assert(stored() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L))
    // replay of batch 3 (crash-retry): rows match their own indexed
    // signatures... doc 5 never entered the index (it was dropped), so
    // it re-matches doc 1 — same edge, same labels, idempotent
    assert(run(Seq((5L, dup5))) === 0L)
    assert(stored() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L))
    // replay of an ADMITTED fresh doc (crash after the MinHash commit):
    // it matches its own indexed signature — a self-loop that must be
    // filtered BEFORE the fold, or the store gains a spurious singleton
    // row for a doc that was never a duplicate
    assert(run(Seq((4L, fresh2))) === 0L)
    assert(stored() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L),
      "a replayed fresh doc must not enter the provenance store")
    // the corpus itself holds only the survivors
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 4L))
  }

  test("sketch sidecar: one mergeable row per admitted batch; merged " +
      "serving tracks the corpus without re-scanning it") {
    import graft.sources.SketchSidecar
    val dir = Files.createTempDirectory("corpus_sketch")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val sk = dir.resolve("sketch").toString
    val cfg = SketchSidecar.Cfg(sk, distinctExpr = "doc_id",
      valueExpr = "length(text)", compactEvery = 2,
      kmvKeyExpr = Some("doc_id"))
    // three batches; batch 2 carries a near-dup of an indexed batch-1 doc
    // (dropped by the gate, so the sketch row must cover SURVIVORS only)
    def word(i: Int, j: Int) = s"w${i}x$j"
    def text(i: Int, words: Int) =
      (1 to words).map(word(i, _)).mkString(" ")
    val b1 = Seq((1L, base), (2L, text(2, 10))).toDF("doc_id", "text")
    val b2 = Seq((3L, nearDup), (4L, text(4, 30))).toDF("doc_id", "text")
    val b3 = Seq((5L, text(5, 50))).toDF("doc_id", "text")
    val n1 = CorpusPipeline.dedupAndAppend(b1, corpus, idx, "doc_id",
      "text", 0.8, sketch = Some(cfg))
    val n2 = CorpusPipeline.dedupAndAppend(b2, corpus, idx, "doc_id",
      "text", 0.8, sketch = Some(cfg))
    val n3 = CorpusPipeline.dedupAndAppend(b3, corpus, idx, "doc_id",
      "text", 0.8, sketch = Some(cfg))
    assert((n1, n2, n3) === ((2L, 1L, 1L)), "doc 3 must dedup away")
    // one sidecar row per admitted batch, each accounting its survivors
    val rows = spark.read.parquet(sk).select("n").as[Long]
      .collect().sorted.toSeq
    assert(rows === Seq(1L, 1L, 2L))
    // served distinct: HLL union across the 3 rows — exact in sparse
    // mode at this cardinality, and equal to the corpus' true count
    // without any corpus scan
    val dist = SketchSidecar.servedDistinct(spark, sk).collect().head
    assert(dist.getLong(0) === 3L) // batches merged
    assert(dist.getLong(1) === 4L) // hll_sketch_estimate is a bigint
    // served median: realized tie-aware rank error within the documented
    // bound (2/K + 1/accuracy + 1/n granularity)
    val p50 = SketchSidecar.servedQuantiles(spark, sk, Seq(0.5))
      .collect().head.getDouble(1)
    val lengths = spark.read.parquet(corpus)
      .select(length(col("text")).cast("double")).as[Double]
      .collect().sorted
    val n = lengths.length
    val lt = lengths.count(_ < p50)
    val le = lengths.count(_ <= p50)
    val errExcess = math.max(0.0,
      math.max((lt + 1).toDouble / n - 0.5, 0.5 - le.toDouble / n)) -
      1.0 / n
    assert(errExcess <= 2.0 / cfg.numBuckets + 1.0 / cfg.accuracy + 1e-9,
      s"served p50=$p50 rank error beyond contract (lengths=" +
        s"${lengths.toSeq})")
    // the KMV face rides the same loop rows: survivors-only (the deduped
    // doc 3 never enters the sketch) and EXACT below k — 4 distinct ids
    assert(SketchSidecar.servedKmvDistinct(spark, sk)
      .collect().head.getDouble(1) === 4.0)
    // compactEvery=2: the cadence counter rides in the sidecar dir and
    // the 2-append compaction collapsed the per-batch files
    assert(new java.io.File(s"$sk/_maint_appends").exists())
    val files = Option(new java.io.File(sk).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(files <= 2, s"expected compacted sidecar, got $files files")
  }

  test("exact-key gate in the corpus loop: re-delivered texts die at the " +
      "cheap gate, near-dups still die at the MinHash gate, keys commit " +
      "after the signatures") {
    import graft.sources.BloomKeyIndex
    val dir = Files.createTempDirectory("corpus_exact_gate")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val keys = Some(BloomKeyIndex.Cfg(dir.resolve("keys").toString,
      keyExpr = "text", expectedItems = 4096L, numBits = 32768L))
    val b1 = Seq((1L, base), (2L, fresh2)).toDF("doc_id", "text")
    assert(CorpusPipeline.dedupAndAppend(b1, corpus, idx, "doc_id",
      "text", 0.8, exactKeys = keys) === 2L)
    // batch 2: an EXACT re-delivery (new id, same bytes → exact gate),
    // a NEAR-dup (one word off → passes the exact gate, dies at the
    // MinHash gate), and a fresh doc
    val b2 = Seq((10L, base), (11L, nearDup),
      (12L, "entirely new content about streaming watermarks and " +
        "stateful aggregation in distributed query engines today"))
      .toDF("doc_id", "text")
    assert(CorpusPipeline.dedupAndAppend(b2, corpus, idx, "doc_id",
      "text", 0.8, exactKeys = keys) === 1L)
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L, 12L))
    // every admitted doc's key is indexed (commit ordering: keys land
    // last, so admitted size == keys size after a clean run)
    assert(spark.read.parquet(s"${keys.get.indexPath}/keys").count() === 3L)
    // a replay of batch 2 (the crash-retry shape) admits nothing and
    // appends no keys twice
    assert(CorpusPipeline.dedupAndAppend(b2, corpus, idx, "doc_id",
      "text", 0.8, exactKeys = keys) === 0L)
    assert(spark.read.parquet(s"${keys.get.indexPath}/keys").count() === 3L)
  }

  test("quarantine triage: MIXED legacy/tagged queue — legacy rows fold " +
      "into the -1 batch, tags survive, batches stay separate") {
    import graft.streaming.CorpusStream
    import graft.operators.Divergence
    val dir = Files.createTempDirectory("corpus_triage_mixed")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val quar = dir.resolve("quarantine").toString
    val garbledA = (("zzqx wvvk pqzt mmnb rrdd zzqx wvvk pqzt ggfh jjkl " +
      "qqww eerr ttyy uuii oopp aass ddff gghh jjkk llzz xxcc vvbb ") * 25)
      .trim
    val garbledB = (("foo1 bar2 baz3 qux4 quux5 foo1 bar2 baz3 corge6 " +
      "grault7 garply8 waldo9 fred0 plugh1 xyzzy2 thud3 foo1 bar2 ") * 25)
      .trim
    // the normal upgrade state: a file quarantined BEFORE the __q_batch
    // tag existed (no column) next to a tagged file — one queue dir,
    // two schemas
    Seq((2L, garbledA)).toDF("doc_id", "text")
      .write.mode("append").parquet(quar)
    Seq((5L, garbledB)).toDF("doc_id", "text")
      .withColumn("__q_batch", lit(7L))
      .write.mode("append").parquet(quar)
    // reference fits vocabulary A only → the legacy (-1) batch clears,
    // the tagged batch is held. Pooled gating over the mixture — the
    // failure the tag exists to prevent — could not release exactly one
    val refA = dir.resolve("refA").toString
    Divergence.writeReferenceCounts(
      Seq((0L, garbledA)).toDF("doc_id", "text"), "text", refA)
    val r1 = CorpusStream.reprocessQuarantine(spark, quar, refA, 0.15,
      corpus, idx)
    assert(r1.batches === 2L && r1.released === 1L && r1.admitted === 1L,
      s"legacy batch must clear separately from the tagged one: $r1")
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(2L))
    // the held batch kept its tag through the queue rewrite — a dropped
    // tag column here would pool it with future legacy rows
    val held = spark.read.parquet(quar)
    assert(held.columns.contains("__q_batch"))
    assert(held.select("doc_id", "__q_batch").as[(Long, Long)]
      .collect().toSeq === Seq((5L, 7L)))
    // refit to vocabulary B: the tagged batch clears, queue drains
    val refB = dir.resolve("refB").toString
    Divergence.writeReferenceCounts(
      Seq((0L, garbledB)).toDF("doc_id", "text"), "text", refB)
    val r2 = CorpusStream.reprocessQuarantine(spark, quar, refB, 0.15,
      corpus, idx)
    assert(r2.batches === 1L && r2.released === 1L && r2.admitted === 1L)
    assert(!new java.io.File(quar).exists())
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet === Set(2L, 5L))
  }

  test("quarantine triage: parquet-less claimed dir and empty queue dir " +
      "are discarded, not wedged") {
    import graft.streaming.CorpusStream
    import graft.operators.Divergence
    val dir = Files.createTempDirectory("corpus_triage_wedge")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val quar = dir.resolve("quarantine").toString
    val refA = dir.resolve("refA").toString
    Divergence.writeReferenceCounts(
      Seq((0L, base)).toDF("doc_id", "text"), "text", refA)
    // an EMPTY-but-existing queue dir (all files consumed by an external
    // cleanup, dir left) must not wedge the claim on schema inference
    assert(new java.io.File(quar).mkdirs())
    val r0 = CorpusStream.reprocessQuarantine(spark, quar, refA, 0.15,
      corpus, idx)
    assert(r0 === CorpusStream.ReprocessResult(0L, 0L, 0L))
    assert(!new java.io.File(quar).exists(), "empty claim must be removed")
    // a claimed dir whose data files were deleted by a crash mid-removal:
    // without the guard every later invocation throws on schema
    // inference and the LIVE queue is never claimed again
    val claimed = graft.sources.Compaction
      .stagingDir(new java.io.File(quar), "triage")
    assert(claimed.mkdirs())
    Seq((9L, base)).toDF("doc_id", "text")
      .write.mode("append").parquet(quar)
    val r1 = CorpusStream.reprocessQuarantine(spark, quar, refA, 0.15,
      corpus, idx)
    assert(r1.batches === 1L && r1.released === 1L && r1.admitted === 1L,
      s"live queue must be claimed past the garbage claim: $r1")
    assert(!claimed.exists() && !new java.io.File(quar).exists())
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSeq === Seq(9L))
  }

  test("quarantine triage: maxBatches bounds one invocation — a 50-batch " +
      "backlog drains oldest-first, exactly-once, across 5 invocations") {
    import graft.streaming.CorpusStream
    import graft.operators.Divergence
    val dir = Files.createTempDirectory("corpus_triage_backlog")
    val corpus = dir.resolve("corpus").toString
    val idx = dir.resolve("index").toString
    val quar = dir.resolve("quarantine").toString
    val refA = dir.resolve("refA").toString
    Divergence.writeReferenceCounts(
      Seq((0L, base)).toDF("doc_id", "text"), "text", refA)
    // 50 one-doc batches, mutually non-duplicate texts (disjoint token
    // sets — the minhash gate must admit every one exactly once)
    def text(i: Int): String =
      (1 to 12).map(j => s"tok${i}x$j").mkString(" ")
    (0 until 50).map(i => (i.toLong, text(i), i.toLong))
      .toDF("doc_id", "text", "__q_batch")
      .write.mode("append").parquet(quar)
    // maxJs = 10 ≥ any possible JS: every triaged batch releases, so the
    // drain rate is governed purely by the maxBatches bound
    val first = CorpusStream.reprocessQuarantine(spark, quar, refA, 10.0,
      corpus, idx, maxBatches = 10)
    // oldest-first: the first invocation triages batch ids 0..9 exactly
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === (0L until 10L))
    val results = first +: (2 to 5).map { _ =>
      CorpusStream.reprocessQuarantine(spark, quar, refA, 10.0,
        corpus, idx, maxBatches = 10)
    }
    results.foreach { r =>
      assert(r.batches === 10L && r.released === 10L && r.admitted === 10L,
        s"each invocation must triage exactly the bound: $r")
    }
    assert(!new java.io.File(quar).exists(), "backlog must be drained")
    // exactly-once: all 50 docs landed, none twice
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted.toSeq === (0L until 50L))
    // a sixth invocation is a no-op
    val r6 = CorpusStream.reprocessQuarantine(spark, quar, refA, 10.0,
      corpus, idx, maxBatches = 10)
    assert(r6 === CorpusStream.ReprocessResult(0L, 0L, 0L))
  }
}
