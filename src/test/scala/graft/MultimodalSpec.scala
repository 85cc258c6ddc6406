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

  test("frame sampling: every stride-th frame, empty when undersized") {
    val n = media.select(col("media_id"),
        size(Multimodal.sampleFrames(col("content"), 32, 2)).as("n"))
      .orderBy("media_id").as[(Long, Int)].collect().map(_._2).toSeq
    // 100B→3 frames→keep 0,2 = 2; 64B→2→keep 0 = 1; 10B→0; 0B→0
    assert(n === Seq(2, 1, 0, 0))
  }
}
