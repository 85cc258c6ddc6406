package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — the training-data hygiene step that
  * asks "which corpus documents contain verbatim n-grams from an evaluation
  * benchmark?" (the decontamination pass every serious LLM data pipeline
  * runs; cf. the n-gram overlap protocols in the GPT-3 / PaLM / Llama
  * training-data reports).
  *
  * Shape at 100 TB: the benchmark side is small by nature (eval suites are
  * MBs), so its distinct n-gram set is BROADCAST — the corpus is scanned
  * once, its n-grams exploded and joined map-side with zero shuffle of
  * document text. The only exchange is the final per-doc aggregation, and
  * it carries matched (id, gram) pairs only — the contaminated minority,
  * not the corpus. Per-doc gram totals are computed narrowly
  * (`array_distinct` inside the row) rather than via a global distinct, so
  * corpus-sized data never shuffles at all.
  *
  * The n-gram builder stages the split-words array as a real column before
  * the `transform` lambda: expressions referenced inside higher-order-
  * function lambdas are re-evaluated per element (no subexpression
  * elimination), so an unstaged `split()` would re-split the document once
  * per emitted gram.
  */
object Contamination {

  /** Whitespace word n-grams of a STAGED words-array column (inclusive
    * sliding windows, space-joined). Empty array when the doc is shorter
    * than `n` words.
    */
  private def ngramsOf(words: Column, n: Int): Column =
    when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => array_join(slice(words, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Documents of `docs` sharing at least one word `n`-gram with
    * `benchmark`, with per-doc hit counts and contamination rate
    * (distinct matched grams / distinct grams in the doc). Benchmark
    * members present in `docs` surface with rate 1.0 — the expected
    * self-contamination signal.
    */
  def ngramOverlap(docs: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    require(!docs.columns.exists(_.startsWith("__ct_")),
      "input already carries __ct_-prefixed internals")
    require(!benchmark.columns.exists(_.startsWith("__ct_")),
      "benchmark already carries __ct_-prefixed internals")
    def withGrams(df: DataFrame): DataFrame = df
      .withColumn("__ct_words", split(trim(col(textCol)), "\\s+"))
      .withColumn("__ct_grams", ngramsOf(col("__ct_words"), n))

    val benchGrams = withGrams(benchmark)
      .select(explode(col("__ct_grams")).as("__ct_gram")).distinct()

    // explode the DISTINCT grams: a repetition-heavy doc (exactly the
    // population a contamination scan meets) would otherwise feed one join
    // row per duplicate occurrence, and the aggregate can then be a plain
    // count instead of countDistinct
    withGrams(docs)
      .withColumn("__ct_distinct", array_distinct(col("__ct_grams")))
      .select(col(idCol),
        size(col("__ct_distinct")).cast("long").as("n_grams"),
        explode(col("__ct_distinct")).as("__ct_gram"))
      .join(broadcast(benchGrams), "__ct_gram")
      .groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_hits"))
      .select(col(idCol), col("n_hits"), col("n_grams"),
        round(col("n_hits").cast("double") / col("n_grams"), 6)
          .as("contamination"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus: the fraction
    * of a doc's distinct word n-grams unseen in `reference` — the
    * data-selection signal dual to [[ngramOverlap]] (high novelty = new
    * information worth keeping; near-zero novelty = paraphrase/rehash of
    * what the corpus already holds, the soft dedup the span/MinHash passes
    * miss). Every scored doc gets a row — zero matches reads novelty 1.0
    * via the left join; docs shorter than `n` words carry no gram
    * evidence and are omitted (the absent-evidence policy of the LM
    * scorers).
    *
    * Unlike the benchmark overlap, the reference side is CORPUS-SIZED, so
    * its distinct gram set is NOT broadcast: both sides shuffle once on
    * the gram key (map-side distinct first). At 100 TB, join on
    * `xxhash64(gram)` instead of the string to cut the shuffle width —
    * engine-hashed, so this oracle-checked variant keeps the string key.
    */
  def ngramNovelty(docs: DataFrame, reference: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    require(!docs.columns.exists(_.startsWith("__ct_")),
      "input already carries __ct_-prefixed internals")
    require(!reference.columns.exists(_.startsWith("__ct_")),
      "reference already carries __ct_-prefixed internals")
    def withGrams(df: DataFrame): DataFrame = df
      .withColumn("__ct_words", split(trim(col(textCol)), "\\s+"))
      .withColumn("__ct_grams", ngramsOf(col("__ct_words"), n))
    val refGrams = withGrams(reference)
      .select(explode(col("__ct_grams")).as("__ct_gram")).distinct()
      .withColumn("__ct_seen", lit(1L))
    withGrams(docs)
      .withColumn("__ct_distinct", array_distinct(col("__ct_grams")))
      .where(size(col("__ct_distinct")) > 0)
      .select(col(idCol),
        size(col("__ct_distinct")).cast("long").as("n_grams"),
        explode(col("__ct_distinct")).as("__ct_gram"))
      .join(refGrams, Seq("__ct_gram"), "left")
      .groupBy(col(idCol), col("n_grams"))
      .agg(coalesce(sum("__ct_seen"), lit(0L)).as("n_seen"))
      .select(col(idCol), col("n_grams"), col("n_seen"),
        round(lit(1.0) - col("n_seen").cast("double") / col("n_grams"), 6)
          .as("novelty"))
  }
}
