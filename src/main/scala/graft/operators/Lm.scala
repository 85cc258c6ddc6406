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
  def bigramPerplexity(docs: DataFrame, train: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    // house rule (cf. Keywords/Contamination): internal names fail loudly
    // instead of silently colliding with user columns
    require(!docs.columns.exists(_.startsWith("__lm_")) &&
      !train.columns.exists(_.startsWith("__lm_")),
      "input already carries __lm_-prefixed internals")
    require(!Seq("p", "n", "bg", "cbn", "cpn", "vocab", "lp",
        "n_bigrams", "ppl") // the last two are OUTPUT columns — an idCol
      .contains(idCol),     // named like them would duplicate silently
      s"idCol '$idCol' collides with an Lm internal or output column name")
    def stream(df: DataFrame, cols: Column*): DataFrame = df
      .withColumn("__lm_w", toks(col(textCol)))
      .where(size(col("__lm_w")) >= 2)
      .select((explode(bigrams(col("__lm_w"))).as("bg") +: cols): _*)
      .select((col("bg.p").as("p") +: col("bg.n").as("n") +: cols): _*)
    val trainBg = stream(train)
    val cb = trainBg.groupBy("p", "n").agg(count(lit(1)).as("cbn"))
    val cp = cb.groupBy("p").agg(sum("cbn").as("cpn"))
    // vocabulary = distinct tokens of the TRAINING stream (both positions
    // — the first token of each doc appears only as a context)
    val v = cb.select(col("p").as("w")).union(cb.select(col("n").as("w")))
      .distinct().agg(count(lit(1)).as("vocab"))
    stream(docs, col(idCol))
      .join(cb, Seq("p", "n"), "left")
      .join(cp, Seq("p"), "left")
      .crossJoin(v)
      .select(col(idCol),
        log((coalesce(col("cbn"), lit(0L)) + 1.0) /
          (coalesce(col("cpn"), lit(0L)) + col("vocab"))).as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(exp(-avg(col("lp"))), 4).as("ppl"))
  }
}
