package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Contamination

class ContaminationSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val benchText =
    "one two three four five six seven eight nine ten"

  test("flags docs sharing a verbatim 8-gram with the benchmark, " +
      "exact hit counts and rates") {
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val docs = Seq(
      // 10 words → 3 8-grams; the middle one ("one ... eight") is bench's
      (1L, "zzz one two three four five six seven eight yyy"),
      (2L, "totally different words sharing no gram with anything here now"),
      (100L, benchText) // benchmark member in-corpus → rate 1.0
    ).toDF("doc_id", "text")
    val frame = Contamination.ngramOverlap(docs, bench, "doc_id", "text", 8)
    val out = frame.orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 3L, 0.333333),
      (100L, 3L, 3L, 1.0)))
    // benchmark gram set plans as the broadcast side
    assert(frame.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("short docs produce no grams; internal-name collision fails loudly") {
    val bench = Seq((1L, benchText)).toDF("doc_id", "text")
    val docs = Seq((2L, "only five words right here")).toDF("doc_id", "text")
    val res = Contamination.ngramOverlap(docs, bench, "doc_id", "text", 8)
    assert(res.count() === 0)
    // internal-name collision fails loudly
    intercept[IllegalArgumentException] {
      Contamination.ngramOverlap(
        docs.withColumn("__ct_gram", lit(1)), bench, "doc_id", "text", 8)
    }
  }

  test("ngramNovelty: all-seen → 0, unseen → 1, mixed → exact ratio, " +
      "short docs omitted") {
    import graft.operators.Contamination
    val ref = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    // 3-grams of ref: "a b c", "b c d", "c d e"
    val docs = Seq(
      (1L, "a b c d e"),       // all 3 grams seen → novelty 0
      (2L, "x y z w"),         // 2 grams, none seen → novelty 1
      (3L, "a b c d x"),       // grams: abc(seen), bcd(seen), cdx(new) → 1/3
      (4L, "t u")              // shorter than n → omitted
    ).toDF("doc_id", "text")
    val r = Contamination.ngramNovelty(docs, ref, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r.map(_._1) === Seq(1L, 2L, 3L))
    assert(r(0) === ((1L, 3L, 3L, 0.0)))
    assert(r(1) === ((2L, 2L, 0L, 1.0)))
    assert(r(2)._4 === BigDecimal(1.0 - 2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
