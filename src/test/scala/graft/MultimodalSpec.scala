package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val media = Seq(
    (1L, "x" * 100), (2L, "y" * 64), (3L, "z" * 10), (4L, "")
  ).toDF("media_id", "t")
    .select(col("media_id"), col("t").cast("binary").as("content"))

  test("stub decode: deterministic meta + fixed-width features") {
    val out = Multimodal.decode(media, new Multimodal.FakeCodec(8))
      .orderBy("media_id").collect()
    assert(out.map(_.meta.nBytes).toSeq === Seq(100L, 64L, 10L, 0L))
    assert(out.map(_.meta.width).toSeq === Seq(100, 64, 10, 0))
    assert(out.forall(_.features.length == 8))
    // rolling byte histogram: 100 bytes of 'x' (0x78) over 8 buckets
    val expected = 'x'.toInt / 255.0f
    assert(math.abs(out.head.features(0) - 13 * expected) < 1e-4)
  }

  test("BMP codec: parses a real 2x2 24-bit bitmap, rejects non-BMP") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // 2×2 24bpp pixel data: rows padded to 4-byte boundaries (6 → 8 bytes)
    val px = Array[Byte](
      255.toByte, 0, 0, 0, 255.toByte, 0, 0, 0, // row 0: blue, green, pad
      0, 0, 255.toByte, 255.toByte, 255.toByte, 255.toByte, 0, 0) // red, white
    val bmp = "BM".getBytes("US-ASCII") ++ le32(54 + px.length) ++
      le16(0) ++ le16(0) ++ le32(54) ++ // file header: size, reserved, offset
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ // DIB: w,h,bpp
      le32(0) ++ le32(px.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ px
    val df = Seq((1L, bmp)).toDF("media_id", "content")
    val out = Multimodal.decode(df, new Multimodal.BmpCodec(4))
      .collect().head
    assert(out.meta.format === "bmp")
    assert(out.meta.width === 2 && out.meta.height === 2)
    assert(out.meta.nChannels === 3 && out.meta.nBytes === bmp.length.toLong)
    // features histogram covers the PIXEL bytes only, header excluded
    assert(out.features.length === 4)
    assert(math.abs(out.features.sum -
      px.map(b => (b & 0xFF) / 255.0f).sum) < 1e-4)
    intercept[IllegalArgumentException] {
      new Multimodal.BmpCodec(4).decode("not a bitmap at all".getBytes)
    }
  }

  test("frame sampling: every stride-th frame, empty when undersized") {
    val n = media.select(col("media_id"),
        size(Multimodal.sampleFrames(col("content"), 32, 2)).as("n"))
      .orderBy("media_id").as[(Long, Int)].collect().map(_._2).toSeq
    // 100B→3 frames→keep 0,2 = 2; 64B→2→keep 0 = 1; 10B→0; 0B→0
    assert(n === Seq(2, 1, 0, 0))
  }

  test("ImageIO codec: decodes real PNG and JPEG bytes; cross-format " +
      "embeddings of the same image agree on pixels") {
    import java.awt.image.BufferedImage
    def encode(fmt: String): Array[Byte] = {
      val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 3)
        img.setRGB(x, y, (x * 80) << 16 | (y * 100) << 8 | 40)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val codec = new Multimodal.ImageIoCodec(4)
    val df = Seq((1L, encode("png")), (2L, encode("jpg")))
      .toDF("media_id", "content")
    val out = Multimodal.decode(df, codec).collect()
      .sortBy(_.media_id)
    assert(out(0).meta.format === "png")
    assert(out(1).meta.format.startsWith("jp")) // "jpeg"
    assert(out.forall(r => r.meta.width === 3 && r.meta.height === 2))
    // same source image: per-bucket luminance within JPEG quantization noise
    out(0).features.zip(out(1).features).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.15, s"png=$a jpeg=$b")
    }
    intercept[IllegalArgumentException] {
      codec.decode("definitely not an image".getBytes)
    }
  }

  test("WAV codec: real javax.sound round-trip — format/frames/rate/" +
      "channels parsed, amplitude-histogram features deterministic") {
    val codec = new Multimodal.WavCodec(8)
    val bytes = Multimodal.syntheticWav(seed = 7L, nFrames = 100,
      sampleRate = 8000, channels = 2)
    val (meta, feat) = codec.decode(bytes)
    assert(meta.format === "wav")
    assert(meta.width === 100)    // PCM frames
    assert(meta.height === 8000)  // sample rate
    assert(meta.nChannels === 2)
    assert(meta.nBytes === bytes.length.toLong)
    assert(feat.length === 8 && feat.sum > 0f)
    // byte-deterministic: same seed → same payload → same features
    val (_, feat2) = codec.decode(
      Multimodal.syntheticWav(7L, 100, 8000, 2))
    assert(feat.toSeq === feat2.toSeq)
    // different seed → different samples → different histogram
    val (_, feat3) = codec.decode(
      Multimodal.syntheticWav(8L, 100, 8000, 2))
    assert(feat.toSeq !== feat3.toSeq)
    // non-WAV payloads fail loudly, not as garbage metadata
    intercept[Exception] { codec.decode("not audio".getBytes) }

    // distributed decode plumbing over the same codec
    val df = Seq(
      (1L, Multimodal.syntheticWav(1L, 50, 8000, 1)),
      (2L, Multimodal.syntheticWav(2L, 80, 16000, 2))
    ).toDF("media_id", "content")
    val out = Multimodal.decode(df, codec).collect().sortBy(_.media_id)
    assert(out(0).meta.width === 50 && out(0).meta.height === 8000 &&
      out(0).meta.nChannels === 1)
    assert(out(1).meta.width === 80 && out(1).meta.height === 16000 &&
      out(1).meta.nChannels === 2)
  }

  test("WAV codec: 8-bit unsigned and 24-bit signed PCM decode with " +
      "depth-invariant histogram features") {
    val codec = new Multimodal.WavCodec(8)
    val (m16, f16) = codec.decode(
      Multimodal.syntheticWav(7L, 100, 8000, 1, bits = 16))
    val (m8, f8) = codec.decode(
      Multimodal.syntheticWav(7L, 100, 8000, 1, bits = 8))
    val (m24, f24) = codec.decode(
      Multimodal.syntheticWav(7L, 100, 8000, 1, bits = 24))
    // same header metadata at every depth
    for (m <- Seq(m8, m16, m24)) {
      assert(m.format === "wav")
      assert(m.width === 100 && m.height === 8000 && m.nChannels === 1)
    }
    // the fixture encodes the SAME 16-bit waveform at each depth and the
    // decoder scales every sample back to the 16-bit domain, so the
    // histograms agree EXACTLY: 24-bit is lossless (<< 8 then >> 8), and
    // 8-bit floor-truncates to a multiple of 256 — bucket boundaries are
    // multiples of 8192, so truncation can never cross one
    assert(f24.toSeq === f16.toSeq)
    assert(f8.toSeq === f16.toSeq)
  }

  test("GIF frames: REAL multi-image decode — every stride-th frame " +
      "extracted with per-frame features") {
    val gif = Multimodal.syntheticGif(seed = 3L, nFrames = 5,
      width = 4, height = 3)
    val df = Seq((1L, gif), (2L, Multimodal.syntheticGif(4L, 1, 4, 3)))
      .toDF("media_id", "content")
    val frames = Multimodal.decodeFrames(df, stride = 2, featureDim = 4)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    // 5 frames, stride 2 → indexes 0,2,4; 1 frame → index 0
    assert(frames.filter(_.media_id == 1L).map(_.frame_idx).toSeq ===
      Seq(0, 2, 4))
    assert(frames.filter(_.media_id == 2L).map(_.frame_idx).toSeq === Seq(0))
    assert(frames.forall(_.features.length == 4))
    assert(frames.filter(_.media_id == 1L).forall(_.n_frames == 5))
    // frames differ (seed-keyed animation), decode is deterministic
    val f1 = frames.filter(_.media_id == 1L)
    assert(f1(0).features.toSeq !== f1(1).features.toSeq)
    val again = Multimodal.decodeFrames(df, 2, 4)
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    assert(again.map(_.features.toSeq).toSeq ===
      frames.map(_.features.toSeq).toSeq)
  }

  test("dHash: invariant to exact 2x upscale (9|w, 8|h) and PNG round-" +
      "trip; distinct images separate beyond the Hamming radius") {
    val base = Multimodal.syntheticNoisePng(7L, 18, 16)
    assert(Multimodal.dHash(Multimodal.upscaleNearest(base, 2)) ===
      Multimodal.dHash(base))
    assert(Multimodal.dHash(Multimodal.upscaleNearest(base, 1)) ===
      Multimodal.dHash(base)) // factor-1 = pure re-encode round-trip
    // pairwise separation of distinct seeds — the blocking join must not
    // merge genuinely different images (noise PNGs; the structured
    // syntheticPng ramp is measurably TOO self-similar for this, which is
    // exactly why syntheticNoisePng exists)
    val hashes = (0L until 20L).map(s =>
      Multimodal.dHash(Multimodal.syntheticNoisePng(s, 18, 16)))
    val minHam = (for {
      i <- hashes.indices; j <- hashes.indices if i < j
    } yield java.lang.Long.bitCount(hashes(i) ^ hashes(j))).min
    assert(minHam > 3, s"distinct seeds within Hamming radius: $minHam")
  }

  test("imageNearDupPairs: finds exactly the planted resize pair") {
    val media = Seq(
      10L -> Multimodal.syntheticNoisePng(10L, 18, 16),
      11L -> Multimodal.upscaleNearest(
        Multimodal.syntheticNoisePng(10L, 18, 16), 2),
      20L -> Multimodal.syntheticNoisePng(20L, 18, 16),
      30L -> Multimodal.syntheticNoisePng(30L, 18, 16)
    ).toDF("media_id", "content")
    val pairs = Multimodal.imageNearDupPairs(media)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((10L, 11L, 0L)))
  }

  test("media hash index: write once, append batches, serve dedup with " +
      "zero decodes; batch-vs-index gate finds the planted near-dup") {
    val dir = java.nio.file.Files.createTempDirectory("media_hash_idx")
      .resolve("idx").toString
    def png(seed: Long) = Multimodal.syntheticNoisePng(seed, 18, 16)
    // ingest batch 1: two distinct images → hash-once at write
    Multimodal.writeMediaHashIndex(
      Seq(10L -> png(10L), 20L -> png(20L)).toDF("media_id", "content"),
      dir)
    // ingest batch 2 appends: only ITS bytes are decoded
    Multimodal.appendMediaHashIndex(
      Seq(30L -> png(30L)).toDF("media_id", "content"), dir)
    assert(spark.read.parquet(dir).columns.toSet ===
      Set("media_id", "dhash"))
    assert(spark.read.parquet(dir).count() === 3)
    // a new batch carrying an exact ×2 upscale of indexed image 10 (dHash
    // invariant → hamming 0) plus a fresh image: the gate flags exactly
    // the near-dup, touching the index only through stored hashes
    val batch = Seq(
      100L -> Multimodal.upscaleNearest(png(10L), 2),
      200L -> png(200L)).toDF("media_id", "content")
    val hits = Multimodal.dedupAgainstMediaIndex(batch, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(hits === Seq((100L, 10L, 0L)))
    // serving pairs FROM the index matches the decode path on the same
    // corpus — and needs no content column at all
    val viaIndex = Multimodal.imageNearDupPairsFromIndex(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    val viaDecode = Multimodal.imageNearDupPairs(
      Seq(10L -> png(10L), 20L -> png(20L), 30L -> png(30L))
        .toDF("media_id", "content"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaIndex === viaDecode)
  }

  test("hammingJoin64: two-sided tiers — exact pigeonhole and masked " +
      "multi-index — match brute force, hamming 0 is a valid match") {
    import graft.operators.Dedup
    // left/right signatures planted at distances 0, 3, 7, 11, 15, 16
    val base = 0x0123456789ABCDEFL
    def flip(h: Long, bits: Seq[Int]) = bits.foldLeft(h)((x, b) => x ^ (1L << b))
    val right = Seq(
      (0L, base),
      (1L, flip(base, Seq(1, 17, 33))),           // d=3
      (2L, flip(base, Seq(0, 1, 2, 16, 17, 32, 48))),          // d=7
      (3L, flip(base, Seq(0, 1, 2, 16, 17, 18, 32, 33, 48, 49, 50))), // d=11
      (4L, flip(base, (0 to 3).flatMap(b => Seq(b * 16, b * 16 + 1,
        b * 16 + 2)) :+ 60)),                     // d=13
      (5L, flip(base, (0 until 16).map(_ * 4)))   // d=16 — out of range
    ).toDF("rid", "h")
    val left = Seq((100L, base)).toDF("lid", "h")
    for (r <- Seq(0, 3, 7, 11, 15)) {
      val got = Dedup.hammingJoin64(left, "lid", right, "rid", "h", r)
        .select("rid").as[Long].collect().toSet
      val want = Seq((0L, 0), (1L, 3), (2L, 7), (3L, 11), (4L, 13))
        .filter(_._2 <= r).map(_._1).toSet
      assert(got === want, s"radius $r")
    }
  }

  test("videoNearDupPairs: randomized law — the blocked frame-set join " +
      "equals brute-force pairwise Jaccard over the same fingerprints; " +
      "a prefix re-cut shares its full frame set; stride subsamples") {
    // media 0/1 share a seed (1 is the 4-frame prefix re-cut of 0's 6
    // frames); 2/3 share another; 4 stands alone; 5 is a single frame
    val specs = Seq((0L, 100L, 6), (1L, 100L, 4), (2L, 200L, 6),
      (3L, 200L, 3), (4L, 300L, 5), (5L, 400L, 1))
    val media = specs.toDF("media_id", "seed", "nf")
      .as[(Long, Long, Int)]
      .mapPartitions(_.map { case (id, seed, nf) =>
        Multimodal.MediaRecord(id,
          Multimodal.syntheticGif(seed, nf, 9, 8))
      }).toDF()
    val fh = Multimodal.frameHashes(media)
      .as[(Long, Int, Long)].collect()
    val sets = fh.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map(_._3).toSet }
    // brute-force pairwise Jaccard over the ACTUAL fingerprint sets
    def brute(thr: Double) = (for {
      a <- sets.keys.toSeq; b <- sets.keys.toSeq; if a < b
      sh = (sets(a) & sets(b)).size
      if sh > 0
      j = sh.toDouble / (sets(a) | sets(b)).size
      if j >= thr
    } yield (a, b, sh.toLong, j)).toSet
    Seq(0.2, 0.5, 0.9).foreach { thr =>
      val got = Multimodal.videoNearDupPairs(media, minJaccard = thr)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === brute(thr), s"thr=$thr")
    }
    // the prefix re-cut: every frame of 1 is a frame of 0, so the pair
    // lands with shared = |set(1)| (and likewise 2/3)
    val pairs = Multimodal.videoNearDupPairs(media, minJaccard = 0.2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) ===
      sets(1L).size.toLong)
    assert(pairs.contains((2L, 3L)))
    // stride = 2 halves the sampled frames but stays a law-abiding set
    val strided = Multimodal.videoNearDupPairs(media, stride = 2,
      minJaccard = 0.01)
    assert(strided.collect().forall(r => r.getDouble(3) <= 1.0))
    intercept[IllegalArgumentException] {
      Multimodal.videoNearDupPairs(media, minJaccard = 0.0)
    }
    // boilerplate-frame cap: capping df at 1 removes every shared frame
    // from blocking AND sets — no pair survives; at the corpus size it
    // is a no-op equal to the uncapped law
    assert(Multimodal.videoNearDupPairs(media, minJaccard = 0.01,
      maxFrameDf = 1L).count() === 0L)
    val capped = Multimodal.videoNearDupPairs(media, minJaccard = 0.2,
        maxFrameDf = specs.size.toLong)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(capped === brute(0.2))
  }

  test("audioHash: invariant to exact 2x time stretch (65|frames) and " +
      "re-encode; distinct noise seeds separate; stereo decodes") {
    val base = Multimodal.syntheticNoiseWav(5L, 130, 8000, 1)
    assert(Multimodal.audioHash(Multimodal.stretchWav(base, 2)) ===
      Multimodal.audioHash(base))
    assert(Multimodal.audioHash(Multimodal.stretchWav(base, 1)) ===
      Multimodal.audioHash(base)) // factor-1 = container round-trip
    val stereo = Multimodal.syntheticNoiseWav(6L, 130, 8000, 2)
    assert(Multimodal.audioHash(Multimodal.stretchWav(stereo, 2)) ===
      Multimodal.audioHash(stereo))
    val hashes = (0L until 20L).map(s =>
      Multimodal.audioHash(Multimodal.syntheticNoiseWav(s, 130, 8000, 1)))
    val minHam = (for {
      i <- hashes.indices; j <- hashes.indices if i < j
    } yield java.lang.Long.bitCount(hashes(i) ^ hashes(j))).min
    assert(minHam > 3, s"distinct seeds within Hamming radius: $minHam")
    intercept[IllegalArgumentException] { // < 65 frames: no window stream
      Multimodal.audioHash(Multimodal.syntheticNoiseWav(1L, 64, 8000, 1))
    }
  }

  test("audioNearDupPairs: finds exactly the planted stretch pair") {
    val base = Multimodal.syntheticNoiseWav(40L, 130, 8000, 1)
    val media = Seq(
      40L -> base,
      41L -> Multimodal.stretchWav(base, 3),
      50L -> Multimodal.syntheticNoiseWav(50L, 130, 8000, 1),
      60L -> Multimodal.syntheticNoiseWav(60L, 130, 8000, 1)
    ).toDF("media_id", "content")
    val pairs = Multimodal.audioNearDupPairs(media)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((40L, 41L, 0L)))
  }
}
