package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression library for large-scale training-data pipelines
  * (language ID, quality scoring, token counting, fingerprinting, shingling).
  *
  * All pure Catalyst `Column` composition over higher-order array functions —
  * narrow (no shuffle), codegen-friendly, and therefore scan-speed at 100 TB:
  * each document is processed independently inside whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace token count (whitespace split of the trimmed text). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: splits on word/number/punctuation boundaries the
    * way byte-pair tokenizers tend to (letters runs, digit runs, single
    * punctuation marks each count), giving a cheap token-budget estimate.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"), lit(0)))

  /** Ratio of punctuation characters to total characters (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^.,;:!?'\"()\\[\\]-]", "")).cast("double") / n)
  }

  /** Ratio of alphabetic (Unicode letter) characters to total characters. */
  def alphaRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^\\p{L}]", "")).cast("double") / n)
  }

  /** Mean whitespace-token length. */
  def avgWordLen(text: Column): Column = {
    val toks = tokenCount(text)
    when(toks === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "\\s", "")).cast("double") / toks)
  }

  private val enStopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "for", "on", "with", "as", "at", "by", "be", "this", "that", "are")

  /** Fraction of whitespace tokens that are (lowercased) English stopwords —
    * a natural-language-ness signal used by quality classifiers.
    */
  def stopwordRatio(text: Column, markers: Seq[String] = enStopwords): Column =
    // hit count as a native single-pass expression (the interpreted
    // filter-lambda form was the last HOF in the quality-gate scan path);
    // the denominator keeps the UNFILTERED token count, as before
    when(length(trim(text)) === 0, lit(0.0)).otherwise(
      MarkerLang.markerCount(text, markers).cast("double") /
        size(split(lower(trim(text)), "\\s+")))

  /** Composite heuristic quality score in [0,1]: rewards mid-length docs,
    * natural stopword density, alphabetic content; penalizes punctuation
    * soup. Weights are heuristic — the point is the *shape* of a quality
    * scorer as one codegen'd expression.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 64.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val alphaScore = alphaRatio(text)
    val punctPenalty = least(punctRatio(text) * 4.0, lit(1.0))
    round(greatest(lit(0.0),
      lenScore * 0.3 + stopScore * 0.3 + alphaScore * 0.4 - punctPenalty * 0.2), 4)
  }

  private[functions] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that", "this"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "con", "para"),
    "vi" -> Seq("và", "của", "là", "có", "không", "người", "được", "trong"))

  /** Heuristic language ID: CJK-character detection for zh, else the
    * language whose stopword-marker hit count is highest (ties broken by
    * marker-list order above; "und" = undetermined when nothing matches).
    * One pass, no shuffle — scales linearly like any scan expression.
    */
  def langId(text: Column): Column =
    // marker vote as a native single-pass expression (the HOF form ran one
    // interpreted filter per language); the CJK branch stays in the
    // codegen'd regex. coalesce: NULL text scores "und" — the pre-native
    // fold returned its accumulator literal on null and the DuckDB twin's
    // ELSE does the same, so null propagation here would be a divergence
    when(length(regexp_replace(text, "[^\\p{IsHan}]", "")) > 0, lit("zh"))
      .otherwise(coalesce(MarkerLang.markerLang(text), lit("und")))

  /** PII regex patterns, shared by the Spark expression and the DuckDB
    * oracle — every construct here ([...] classes, {m,n} repetition, \b,
    * \d, alternation-free chains) parses IDENTICALLY in Java regex and
    * RE2, which is what lets the redaction be hash-checked cross-engine.
    * No lookbehind (RE2 lacks it), no \p classes (dialect-divergent).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneDashedRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val PhoneRunRe = "\\+?\\d{9,15}"

  /** PII redaction: emails, IPv4 addresses and phone numbers replaced by
    * placeholder tags — the standard scrub pass before training-data
    * release. Order matters and is fixed: emails first (their digits must
    * not be half-eaten by the phone patterns), then IPs (dot-separated
    * short digit runs the dashed-phone pattern must not see), then phones.
    * A chain of codegen'd regexp_replace — narrow, scan-speed.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneDashedRe, "<PHONE>"),
      PhoneRunRe, "<PHONE>")

  /** Count of PII matches per kind (pre-redaction), for audit rows. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)),
    "n_ips" -> regexp_count(text, lit(Ipv4Re)),
    "n_phones" -> (regexp_count(text, lit(PhoneDashedRe)) +
      regexp_count(regexp_replace(regexp_replace(text, EmailRe, ""),
        PhoneDashedRe, ""), lit(PhoneRunRe))))

  /** Fraction of REPEATED word n-grams: 1 − distinct/total over the
    * non-distinct n-gram stream (0 when fewer than n words) — the
    * Gopher-style repetition signal used to filter boilerplate/spam from
    * training corpora. Empty tokens are filtered so the tokenization is
    * identical to DuckDB's `string_split_regex` + `list_filter` (the
    * oracle computes the same recurrence with `generate_series`).
    */
  def repetitionRatio(text: Column, n: Int): Column = {
    require(n >= 1)
    // native one-pass expression ([[NgramRepetitionExpr]]); the equivalent
    // HOF formula — 1 − distinct/total over transform(sequence(1, total),
    // i => array_join(slice(toks, i, n), ' ')) — re-evaluates the slice
    // per gram (interpreted, O(len²)) and profiled 17× slower at sf0.1
    NgramRepetition.ngramRepetition(text, n)
  }

  /** Polynomial rolling-hash fingerprint of the normalized text
    * (lowercased, whitespace collapsed): acc = (acc·131 + codepoint) mod
    * (1e9+7). Stable across engines — the same fold is expressible in any
    * SQL dialect with list-reduce, which is what the DuckDB oracle does.
    * The fold runs as the native codegen'd [[RollingHashExpr]] (the HOF
    * `aggregate(split(...))` form materialized a per-character array and
    * interpreted a lambda per element); normalization stays in shared
    * Catalyst expressions so both forms see identical input.
    */
  def fingerprint(text: Column): Column =
    RollingHash.rollingHash(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Character k-shingles (distinct), for Jaccard/MinHash dedup. */
  def shingles(text: Column, k: Int): Column =
    when(length(text) < k, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), length(text) - (k - 1)),
          i => text.substr(i, lit(k)))))

  /** Word n-grams (distinct) of the lowercased text, joined by single
    * spaces — the unit for n-gram Jaccard dedup.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " "))))
  }

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val union = size(array_union(a, b))
    when(union === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / union)
  }
}
