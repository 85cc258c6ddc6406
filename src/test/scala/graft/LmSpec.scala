package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lm

class LmSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("bigram perplexity: hand-computed add-one smoothed fixture") {
    // train = doc: "a b a b" → c(a,b)=2, c(b,a)=1, c(a)=2, c(b)=1, |V|=2
    // p(b|a) = 3/4, p(a|b) = 2/3 → ppl = (0.75·0.75·2/3)^(-1/3)
    val d = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = Lm.bigramPerplexity(d, d, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(r.length === 1)
    assert(r.head._2 === 3L) // bigrams
    val expected = math.pow(0.75 * 0.75 * (2.0 / 3.0), -1.0 / 3.0)
    assert(math.abs(r.head._3 - (math.rint(expected * 1e4) / 1e4)) < 1e-9)
  }

  test("scoring a fresh batch against a frozen train corpus: unseen " +
      "bigrams hit the smoothing floor; sub-bigram docs are omitted") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "b b"), // unseen bigram: p = (0+1)/(c(b)=1 + |V|=2) = 1/3
      (11L, "a")    // one token → no bigram evidence → omitted
    ).toDF("doc_id", "text")
    val r = Lm.bigramPerplexity(batch, train, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(r.map(_._1).toSeq === Seq(10L))
    assert(r.head._3 === 3.0)
  }

  test("LM index sidecar roundtrip: perplexityAgainstIndex equals " +
      "bigramPerplexity with the same frozen train corpus") {
    val dir = java.nio.file.Files.createTempDirectory("lm_idx").toString
    val train = ((1L to 6L).map(i => (i, "the cat sat on the mat again")) :+
      (7L, "a b a b c a")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the cat sat on a mat"),   // mix of seen and unseen bigrams
      (11L, "zeb qux vor mip"),        // fully unseen → smoothing floor
      (12L, "a")                       // sub-bigram → omitted
    ).toDF("doc_id", "text")
    Lm.writeLmIndex(train, "text", dir)
    val direct = Lm.bigramPerplexity(batch, train, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val frozen = Lm.perplexityAgainstIndex(batch, "doc_id", "text", dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(frozen === direct)
    assert(frozen.map(_._1) === Seq(10L, 11L))
  }

  test("outlier detection: a shuffled-vocab doc scores higher self-" +
      "perplexity than the repetitive majority") {
    val docs = ((1L to 8L).map(i => (i, "the cat sat on the mat again")) :+
      (9L, "zeb qux vor mip laz tun")).toDF("doc_id", "text")
    val r = Lm.bigramPerplexity(docs, docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val common = r.filter(_._1 <= 8).map(_._3)
    val outlier = r.find(_._1 == 9L).get._3
    assert(common.forall(_ < outlier))
  }

  test("trigram perplexity: hand-computed interpolated fixture; short " +
      "docs omitted; soup scores above fluent text") {
    // train = {"a b c", "a b"} (tokens a,b,c,a,b → N=5, V=3; c2ctx(b)=1
    // because only (b,c) continues b). Scoring doc 1's single trigram
    // (a,b,c): p3 = (1+1)/(1+3), p2 = (1+1)/(1+3), p1 = (1+1)/(5+3);
    // ppl = 1 / (0.6·p3 + 0.3·p2 + 0.1·p1)
    val one = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val r = Lm.trigramPerplexity(one, one, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(r.map(_._1).toSeq === Seq(1L)) // doc 2 has no trigram
    assert(r.head._2 === 1L)
    val p = 0.6 * (2.0 / 4.0) + 0.3 * (2.0 / 4.0) + 0.1 * (2.0 / 8.0)
    val expected = BigDecimal(math.exp(-math.log(p)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.head._3 === expected)
    // repeated fluent phrase vs shuffled soup under the interpolated model
    val base = "the quick brown fox jumps over the lazy dog"
    val docs = ((1L to 8L).map(i => (i, base)) :+
      (9L, "dog the over quick lazy fox brown jumps the"))
      .toDF("doc_id", "text")
    val s = Lm.trigramPerplexity(docs, docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(s.filter(_._1 <= 8).map(_._3).forall(_ < s.last._3))
  }

  test("DSIR: target-like raw docs outweigh off-target ones; hashed " +
      "buckets preserve the ranking on a collision-free fixture") {
    import graft.operators.Dsir
    // target talks about spark; raw mixes spark-like and cooking docs
    val target = Seq(
      (100L, "spark shuffle join spark shuffle join"),
      (101L, "spark join shuffle spark join")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "spark shuffle join spark"),   // on-target
      (2L, "bake flour sugar bake flour"), // off-target
      (3L, "spark join bake")             // mixed
    ).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L))
    assert(w(1L) > 0 && w(2L) < 0) // sign = which model claims the doc
    // top-1 selection is the on-target doc, hashed or exact
    assert(Dsir.selectTop(raw, target, "doc_id", "text", 1)
      .as[(Long, Long, Double)].head()._1 === 1L)
    assert(Dsir.selectTop(raw, target, "doc_id", "text", 1, buckets = 1 << 20)
      .as[(Long, Long, Double)].head()._1 === 1L)
    // a doc with fewer than two tokens carries no evidence and is omitted
    val short = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(Dsir.importanceWeights(short, target, "doc_id", "text").count() === 0)
    // frozen-index roundtrip: scoring raw against its own materialized
    // models reproduces importanceWeights exactly (bucket arity included)
    val dir = java.nio.file.Files.createTempDirectory("dsiridx").toString
    Dsir.writeDsirIndex(raw, target, "text", dir)
    val frozen = Dsir.weightsAgainstIndex(raw, "doc_id", "text", dir)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(frozen === w)
  }
}
