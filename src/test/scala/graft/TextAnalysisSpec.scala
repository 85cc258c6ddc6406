package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).as[T].head()

  test("tokenCount") {
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "a b  c") === 3)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "   ") === 0)
    assert(one[Int](TextAnalysis.tokenCount(col("t")), "") === 0)
  }

  test("subwordCount splits letter/digit/punct runs") {
    assert(one[Int](TextAnalysis.subwordCount(col("t")), "ab12 cd, e!") === 6)
  }

  test("fingerprint matches manual rolling hash and handles empty") {
    val s = "hello world"
    var acc = 0L
    s.foreach(ch => acc = (acc * 131 + ch.toInt) % 1000000007L)
    assert(one[Long](TextAnalysis.fingerprint(col("t")), "Hello   WORLD") === acc)
    assert(one[Long](TextAnalysis.fingerprint(col("t")), "") === 0L)
  }

  test("native rolling hash is identical to the declarative HOF fold") {
    // the HOF formulation the native expression replaced — kept as the
    // executable specification of the fold
    def hofFingerprint(text: org.apache.spark.sql.Column) = {
      val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
      val chars = split(norm, "")
      when(length(norm) === 0, lit(0L)).otherwise(aggregate(
        chars, lit(0L),
        (acc, ch) => (acc * 131L + ascii(ch)) % 1000000007L))
    }
    // BMP-only fixtures ON PURPOSE: for astral-plane text the HOF form
    // diverges (split("") yields UTF-16 code units) and the native
    // code-point behavior is the intended one — pinned by the non-BMP
    // test below against the oracle recurrence itself.
    val fixtures = Seq("Hello   WORLD", "", "xin chào thế giới",
      "tabs\tand\nnewlines", "số 1 único ß")
    fixtures.foreach { s =>
      assert(one[Long](TextAnalysis.fingerprint(col("t")), s) ===
        one[Long](hofFingerprint(col("t")), s), s)
    }
  }

  test("non-BMP fingerprint follows the CODE-POINT recurrence (oracle semantics)") {
    // Emoji are one code point but two UTF-16 code units. The DuckDB
    // oracle folds per code point (unicode()); the native expression must
    // match IT — not the split+ascii HOF form, which walks code units on
    // astral text. The expected value is the oracle recurrence computed
    // directly here.
    val s = "Héllo 😀🚀  Wörld"
    val norm = s.trim.toLowerCase.replaceAll("\\s+", " ")
    var acc = 0L
    norm.codePoints().forEach(cp => acc = (acc * 131 + cp) % 1000000007L)
    assert(one[Long](TextAnalysis.fingerprint(col("t")), s) === acc)
  }

  test("redactPii masks emails, IPs and phone numbers") {
    def red(s: String) = one[String](TextAnalysis.redactPii(col("t")), s)
    assert(red("mail a.b+c@ex-ample.org or call 555-123-4567 now") ===
      "mail <EMAIL> or call <PHONE> now")
    assert(red("from 10.0.0.1 dial +84912345678 end") ===
      "from <IP> dial <PHONE> end")
    assert(red("no pii here") === "no pii here")
    assert(red("") === "")
    // email digits must not be half-eaten by the phone patterns
    assert(red("user123456789@host.com") === "<EMAIL>")
  }

  test("piiCounts tallies each kind pre-redaction") {
    val s = "a@b.co and c@d.org from 10.0.0.1 call 555-123-4567 or +84912345678"
    val counts = TextAnalysis.piiCounts(col("t"))
      .map { case (n, c) => c.as(n) }
    val r = Seq(s).toDF("t").select(counts: _*)
      .as[(Int, Int, Int)].head()
    assert(r === ((2, 1, 2)))
  }

  test("repetitionRatio flags repeated n-grams") {
    def rep(s: String, n: Int) =
      one[Double](TextAnalysis.repetitionRatio(col("t"), n), s)
    // bigrams of "a b a b a b": [a b, b a, a b, b a, a b] → 2 distinct of 5
    assert(math.abs(rep("a b a b a b", 2) - 0.6) < 1e-12)
    assert(rep("x y z", 2) === 0.0) // both bigrams distinct
    assert(rep("", 2) === 0.0)
    assert(rep("one", 2) === 0.0) // fewer than n words
    assert(rep("w w w w", 3) === 0.5) // [w w w, w w w] → 1 distinct of 2
    assert(rep(null, 2) === 0.0) // null text scores 0.0 (twin's CASE)
  }

  test("langId and repetitionRatio null/CJK parity pins") {
    def lang(s: String) = one[String](TextAnalysis.langId(col("t")), s)
    // null text → 'und': the DuckDB twin's ELSE branch — native expression
    // must not silently switch this to NULL
    assert(lang(null) === "und")
    assert(lang("the cat and the dog is this") === "en")
    assert(lang("der hund und die katze ist") === "de")
    assert(lang("xyzzy qwerty") === "und")
    assert(lang("汉字 here") === "zh")
  }

  test("shingles and jaccard") {
    val sh = one[Seq[String]](TextAnalysis.shingles(col("t"), 3), "abcd")
    assert(sh === Seq("abc", "bcd"))
    assert(one[Seq[String]](TextAnalysis.shingles(col("t"), 3), "ab") === Seq.empty)
    val j = Seq(("abcd", "bcde")).toDF("a", "b")
      .select(TextAnalysis.jaccard(
        TextAnalysis.shingles(col("a"), 3),
        TextAnalysis.shingles(col("b"), 3)).as("j"))
      .as[Double].head()
    assert(j === 1.0 / 3.0) // {abc,bcd} vs {bcd,cde}: 1 common of 3
  }

  test("wordNgrams") {
    val g = one[Seq[String]](TextAnalysis.wordNgrams(col("t"), 2), "A b c")
    assert(g === Seq("a b", "b c"))
  }

  test("langId picks marker language, zh via Han chars") {
    def lid(s: String) = one[String](TextAnalysis.langId(col("t")), s)
    assert(lid("the cat and the dog of the house") === "en")
    assert(lid("der hund und die katze ist nicht da") === "de")
    assert(lid("le chat et la maison est dans les bois") === "fr")
    assert(lid("el gato es una casa por con para los") === "es")
    assert(lid("công ty của chúng tôi là không có người") === "vi")
    assert(lid("这是一个测试") === "zh")
    assert(lid("xyzzy qwerty") === "und")
  }

  test("quality score in [0,1], higher for natural text") {
    def q(s: String) = one[Double](TextAnalysis.qualityScore(col("t")), s)
    val natural = q("the quick brown fox jumps over the lazy dog and runs to the house of cards")
    val soup = q("!!! ??? ,,, ;;; ### $$$ %%%")
    assert(natural > soup)
    assert(natural <= 1.0 && soup >= 0.0)
  }

  test("NFC normalization composes decomposed sequences; composed input is untouched") {
    import graft.functions.TextNormalize
    val decomposed = "Café nét"   // e + COMBINING ACUTE
    val composed = "Café nét"                 // precomposed U+00E9
    assert(one[String](TextNormalize.nfc(col("t")), decomposed) === composed)
    assert(one[String](TextNormalize.nfc(col("t")), composed) === composed)
    // equality after normalization is the property dedup/shingling needs
    assert(one[String](TextNormalize.normalized(col("t")), "  CAFÉ   x ")
      === one[String](TextNormalize.normalized(col("t")), "café x"))
    // null-safe
    assert(Seq[String](null).toDF("t")
      .select(TextNormalize.nfc(col("t")).as("v")).head().isNullAt(0))
  }

  test("NFC normalization on Vietnamese decomposed text matches precomposed") {
    import graft.functions.TextNormalize
    // ế = e + circumflex + acute, two different decomposition orders
    val a = "tiếng Việt"
    val b = "tiếng Việt"
    assert(one[String](TextNormalize.nfc(col("t")), a)
      === one[String](TextNormalize.nfc(col("t")), b))
  }

  test("compression ratio: repetition compresses far below prose, empty " +
      "is 1.0, null-safe, deterministic") {
    import graft.functions.Compression.compressionRatio
    val spam = ("buy cheap now " * 60).trim
    val prose = "The quick brown fox jumps over the lazy dog while a " +
      "distant storm gathers strength above the jagged mountain ridge, " +
      "scattering birds through amber light toward warmer southern vales."
    val rSpam = one[Double](compressionRatio(col("t")), spam)
    val rProse = one[Double](compressionRatio(col("t")), prose)
    assert(rSpam < 0.15, s"repetitive ratio $rSpam")
    assert(rProse > 0.5, s"prose ratio $rProse")
    assert(one[Double](compressionRatio(col("t")), "") === 1.0)
    assert(Seq[String](null).toDF("t")
      .select(compressionRatio(col("t")).as("v")).head().isNullAt(0))
    assert(one[Double](compressionRatio(col("t")), prose) === rProse)
  }
}
