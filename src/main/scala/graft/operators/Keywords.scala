package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TF-IDF keyword extraction — the classic corpus-statistics pass a
  * training-data pipeline runs for topic tagging / quality slicing.
  *
  * Plan shape: one narrow tokenize+explode pass, one (doc, token) count
  * aggregate, one token-keyed document-frequency aggregate, a join of the
  * two, and a per-document top-k window. The document-frequency table is
  * vocabulary-sized — natural-language vocabularies are millions of rows
  * even at 100 TB (Heaps' law), so it broadcasts in most regimes; Spark's
  * size-based planning decides, and when it doesn't fit, the join and the
  * window both key on their aggregate's own grouping so AQE coalesces
  * around two honest shuffles.
  */
object Keywords {

  /** Top-`k` tokens per document by smoothed TF-IDF:
    * `tf(doc, t) * ln((N + 1) / (df(t) + 1))`, whitespace tokenization of
    * the lowercased text (identical to [[graft.functions.TextAnalysis]]'s
    * token stream). Ranking uses the score ROUNDED to 6 decimals with the
    * token as tie-break, so ordering is reproducible across engines and
    * runs (an unrounded double rank could flip on last-ulp differences).
    * Returns (idCol, token, tfidf). Documents with no tokens emit nothing.
    *
    * All intermediate columns are `__kw_`-prefixed, so an input that
    * already carries `token` / `tf` / `df` / `n_docs` columns cannot
    * mis-resolve or trip an ambiguity error; only the two OUTPUT names are
    * reserved (asserted against `idCol`, the one input name that survives
    * into the result).
    */
  def tfIdfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    require(idCol != "token" && idCol != "tfidf",
      s"idCol '$idCol' collides with a reserved output column (token, tfidf)")
    val toks = df.select(col(idCol),
      explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("__kw_token"))
    val tf = toks.groupBy(col(idCol), col("__kw_token"))
      .agg(count(lit(1)).as("__kw_tf"))
    // corpus size as a 1-row frame (kept lazy; broadcast into the join)
    val n = df.agg(count(lit(1)).as("__kw_n"))
    val dfreq = tf.groupBy("__kw_token").agg(count(lit(1)).as("__kw_df"))
    val scored = tf.join(dfreq, "__kw_token").crossJoin(broadcast(n))
      .select(col(idCol), col("__kw_token").as("token"),
        round(col("__kw_tf") *
          log((col("__kw_n") + lit(1.0)) / (col("__kw_df") + lit(1.0))), 6)
          .as("tfidf"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("__kw_rn", row_number().over(w))
      .where(col("__kw_rn") <= k)
      .drop("__kw_rn")
  }
}
