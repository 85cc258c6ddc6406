package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("train learns the expected merges on a known corpus") {
    val corpus = Seq("aa aa aa ab", "aa b").toDF("text")
    // words: aa x4, ab x1, b x1 → pair (a,a) freq 4 is merge 0; after it
    // collapses, the only remaining pair is (a,b) freq 1
    val model = Bpe.train(corpus, "text", numMerges = 5)
    assert(model.merges === Seq(("a", "a"), ("a", "b")))
  }

  test("encode applies merges by rank and round-trips the word") {
    val model = Bpe.BpeModel(Seq(("a", "a"), ("a", "b")))
    assert(model.encodeWord("aaab") === Seq("aa", "ab"))
    assert(model.encodeWord("baaa") === Seq("b", "aa", "a"))
    assert(model.encodeWord("") === Seq.empty)
    assert(model.encodeWord("xyz") === Seq("x", "y", "z"))
    // round-trip: token concatenation reproduces the input word
    for (w <- Seq("aaab", "abab", "aabbaa", "zzz"))
      assert(model.encodeWord(w).mkString === w, w)
  }

  test("encode handles non-BMP text per code point") {
    val model = Bpe.BpeModel(Seq(("😀", "😀")))
    assert(model.encodeWord("😀😀🚀") === Seq("😀😀", "🚀"))
  }

  test("training is deterministic (frequency then lexicographic tie-break)") {
    val corpus = Seq("cb ca ba", "ab ac cb").toDF("text")
    val m1 = Bpe.train(corpus, "text", numMerges = 3)
    val m2 = Bpe.train(corpus, "text", numMerges = 3)
    assert(m1.merges === m2.merges)
    // (c,b) wins at freq 2; the REMAINING pairs all tie at freq 1, so the
    // lexicographically smallest comes second — the tie-break under test
    assert(m1.merges.take(2) === Seq(("c", "b"), ("a", "b")))
  }

  test("maxWords bounds the driver-resident vocab: training sees only the " +
      "top-frequency words") {
    // 3 distinct words; maxWords = 1 keeps only the most frequent ("aa"
    // x3) — merges from the dropped words ("bc", "cd") must not appear,
    // proving the collected table (the ONLY driver state) honors the bound
    val corpus = Seq("aa aa aa bc", "cd bc").toDF("text")
    val m = Bpe.train(corpus, "text", numMerges = 5, maxWords = 1)
    assert(m.merges === Seq(("a", "a")))
  }

  test("degenerate corpora: empty corpus and single-char vocab train safely") {
    val empty = Seq.empty[String].toDF("text")
    assert(Bpe.train(empty, "text", numMerges = 10).merges === Seq.empty)
    // a vocab with no adjacent pairs (all 1-char words) exhausts at 0 merges
    val chars = Seq("a b c", "a c").toDF("text")
    val m = Bpe.train(chars, "text", numMerges = 10)
    assert(m.merges === Seq.empty)
    assert(m.encode("abc") === Seq("a", "b", "c"))
  }

  test("encodeDocs: distributed encode matches driver-side encode") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(50).cache()
    val model = Bpe.train(docs, "text", numMerges = 100, maxWords = 5000)
    assert(model.merges.nonEmpty)
    val dist = Bpe.encodeDocs(docs, "doc_id", "text", model)
      .collect().map(d => d.doc_id -> d.bpe_tokens).toMap
    val local = docs.as[(Long, String)].collect().toMap
    assert(dist.keySet === local.keySet)
    for ((id, text) <- local) {
      assert(dist(id) === model.encode(text), s"doc $id")
      // round-trip: concatenating tokens reproduces the normalized text
      assert(dist(id).mkString ===
        text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString, s"doc $id")
    }
    // BPE with a trained merge table must not INCREASE token count over
    // pure characters (merges only ever concatenate)
    for ((id, text) <- local) {
      val chars = text.trim.toLowerCase.replaceAll("\\s+", "")
        .codePoints().toArray.length
      assert(dist(id).length <= chars)
    }
  }
}
