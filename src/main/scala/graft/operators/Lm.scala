package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring — the CCNet/CC-100 move
  * (Wenzek et al. 2020): score every document's perplexity under an n-gram
  * LM and gate on it, the filter that separates fluent text from word-soup
  * spam better than any single heuristic ratio. Here the LM is an add-one
  * smoothed BIGRAM model trained on the corpus itself (self-perplexity —
  * outlier documents score high against the corpus's own statistics); a
  * curated reference corpus slots in by passing it as `train`.
  *
  * Spark shape, end to end in joins — no driver-side model object:
  *  - tokenize once per doc (the engine's standard lower+trim+`\s+` split,
  *    identical to the TF-IDF and repetition operators, so the DuckDB twin
  *    reuses proven tokenization SQL);
  *  - bigram counts c(prev, w) and context totals c(prev) are two grouped
  *    aggregations with map-side partial combine — by Heaps' law the count
  *    tables grow sublinearly in the corpus, and Catalyst broadcasts them
  *    when small (document-scale joins otherwise);
  *  - per-doc score joins each document's bigram stream against the count
  *    tables and averages log-probabilities: one narrow explode + two
  *    equi-joins + one keyed aggregation.
  *
  * p(w|prev) = (c(prev,w) + 1) / (c(prev) + |V|); perplexity =
  * exp(−mean ln p). Unseen-in-training bigrams of SCORED docs degrade to
  * the smoothing floor via left joins (count 0), so scoring a fresh batch
  * against a frozen training corpus is the same plan.
  */
object Lm {

  private def toks(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")

  /** The (prev, next) bigram stream of a STAGED token-array column —
    * staged because lambda-referenced expressions re-evaluate per element.
    */
  private def bigrams(w: Column): Column =
    transform(sequence(lit(1), size(w) - 1),
      i => struct(element_at(w, i).as("p"), element_at(w, i + 1).as("n")))

  /** Per-document bigram perplexity of `docs` under an add-one smoothed
    * bigram LM estimated from `train` (pass `docs` itself for
    * self-perplexity). Documents with fewer than two tokens carry no
    * bigram evidence and are omitted — a gate treats absent ids by policy,
    * not by a fabricated score. Returns (idCol, n_bigrams, ppl).
    */
  private def guard(docs: DataFrame, idCol: String): Unit = {
    // house rule (cf. Keywords/Contamination): internal names fail loudly
    // instead of silently colliding with user columns
    require(!docs.columns.exists(_.startsWith("__lm_")),
      "input already carries __lm_-prefixed internals")
    require(!Seq("p", "n", "bg", "cbn", "cpn", "vocab", "lp",
        "n_bigrams", "ppl") // the last two are OUTPUT columns — an idCol
      .contains(idCol),     // named like them would duplicate silently
      s"idCol '$idCol' collides with an Lm internal or output column name")
  }

  private def stream(df: DataFrame, textCol: String,
                     cols: Column*): DataFrame = df
    .withColumn("__lm_w", toks(col(textCol)))
    .where(size(col("__lm_w")) >= 2)
    .select((explode(bigrams(col("__lm_w"))).as("bg") +: cols): _*)
    .select((col("bg.p").as("p") +: col("bg.n").as("n") +: cols): _*)

  /** The trained model as three frames: bigram counts (p, n, cbn),
    * context totals (p, cpn), vocabulary size (1 row).
    */
  private def fit(train: DataFrame,
                  textCol: String): (DataFrame, DataFrame, DataFrame) = {
    val cb = stream(train, textCol).groupBy("p", "n")
      .agg(count(lit(1)).as("cbn"))
    val cp = cb.groupBy("p").agg(sum("cbn").as("cpn"))
    // vocabulary = distinct tokens of the TRAINING stream (both positions
    // — the first token of each doc appears only as a context)
    val v = cb.select(col("p").as("w")).union(cb.select(col("n").as("w")))
      .distinct().agg(count(lit(1)).as("vocab"))
    (cb, cp, v)
  }

  private def score(docs: DataFrame, idCol: String, textCol: String,
                    cb: DataFrame, cp: DataFrame, v: DataFrame): DataFrame =
    stream(docs, textCol, col(idCol))
      .join(cb, Seq("p", "n"), "left")
      .join(cp, Seq("p"), "left")
      .crossJoin(v)
      .select(col(idCol),
        log((coalesce(col("cbn"), lit(0L)) + 1.0) /
          (coalesce(col("cpn"), lit(0L)) + col("vocab"))).as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("lp"))), 4).as("ppl"))

  def bigramPerplexity(docs: DataFrame, train: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    guard(docs, idCol)
    require(!train.columns.exists(_.startsWith("__lm_")),
      "train already carries __lm_-prefixed internals")
    val (cb, cp, v) = fit(train, textCol)
    score(docs, idCol, textCol, cb, cp, v)
  }

  /** Materialize the trained bigram LM as an index sidecar — the
    * [[Dedup.writeMinhashIndex]] / [[Similarity.writeIvfPqIndex]] pattern
    * applied to the LM: count tables (sublinear in the corpus by Heaps'
    * law) written once, so a corpus-builder loop gates every batch
    * against a FROZEN reference model without retraining. Layout:
    * `bigrams` (p, n, cbn), `contexts` (p, cpn), `vocab` (1 row).
    */
  def writeLmIndex(train: DataFrame, textCol: String, path: String): Unit = {
    val (cb, cp, v) = fit(train, textCol)
    cb.write.mode("overwrite").parquet(s"$path/bigrams")
    cp.write.mode("overwrite").parquet(s"$path/contexts")
    v.coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Score documents against a FROZEN materialized LM — the exact
    * [[bigramPerplexity]] plan with the training aggregations replaced by
    * sidecar reads; unseen bigrams hit the add-one smoothing floor via
    * the same left joins. Cost per batch: the batch's own bigram stream
    * plus two equi-joins against the count tables.
    */
  def perplexityAgainstIndex(docs: DataFrame, idCol: String,
                             textCol: String, path: String): DataFrame = {
    guard(docs, idCol)
    val spark = docs.sparkSession
    score(docs, idCol, textCol,
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"),
      spark.read.parquet(s"$path/vocab"))
  }
}
