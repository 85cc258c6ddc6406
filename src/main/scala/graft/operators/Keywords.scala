package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The per-(doc, term) BM25 score — Lucene's positive idf times the
    * saturated-tf/length-norm fraction — as ONE Column tree shared by
    * every serving path ([[bm25TopK]], [[bm25BatchTopK]],
    * [[graft.sources.TextIndex.bm25TopK]]): the index-backed serve is
    * hash-compared against the scan path's DuckDB twin, so the two sides
    * must apply the exact same operator association (floating-point
    * multiplication/division is not associative; a re-parenthesized
    * "equal" formula drifts in the last ulp and flips rounded ranks).
    */
  private[graft] def bm25ScoreCol(tf: Column, dfc: Column, n: Column,
                                  len: Column, avgdl: Column,
                                  k1: Double, b: Double): Column =
    log(lit(1.0) + (n - dfc + lit(0.5)) / (dfc + lit(0.5))) *
      (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * len / avgdl))

  /** BM25 retrieval: top-`k` documents for a bag-of-words query
    * (Robertson/Okapi BM25, the ranking function behind Lucene and every
    * keyword-retrieval stage of a RAG / training-data pipeline).
    *
    * Per matched (doc, term):
    * `idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * len/avgdl))` with
    * Lucene's positive idf `ln(1 + (N - df + 0.5) / (df + 0.5))`, summed
    * per document; `avgdl` averages token counts over ALL `N` documents
    * (zero-token docs included).
    *
    * Plan shape: one tokenize+explode pass; the term filter lands directly
    * on the exploded stream, so tf/df/score frames hold only rows for the
    * |Q| query terms — corpus-scale cost is the narrow scan plus
    * aggregates bounded by (docs containing a query term) · |Q|. The
    * doc-length aggregate is the one full-width pass (it must see every
    * doc for avgdl); df and the 1-row (N, avgdl) stats broadcast. Ranking
    * rounds to 6 decimals with `idCol` as tie-break, reproducible
    * cross-engine. Returns (idCol, bm25) — docs matching no term emit
    * nothing.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               query: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(idCol != "bm25",
      s"idCol '$idCol' collides with the reserved output column bm25")
    require(query.nonEmpty, "BM25 needs at least one query term")
    val terms = query.map(_.toLowerCase).distinct
    val toks = df.select(col(idCol),
      explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("__bm_token"))
    val lens = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__bm_len"))
    // N and avgdl over ALL docs — zero-token docs enter as length 0
    val stats = df.select(col(idCol)).join(lens, Seq(idCol), "left")
      .agg(count(lit(1)).as("__bm_n"),
        avg(coalesce(col("__bm_len"), lit(0L))).as("__bm_avgdl"))
    val tf = toks.where(col("__bm_token").isin(terms: _*))
      .groupBy(col(idCol), col("__bm_token"))
      .agg(count(lit(1)).as("__bm_tf"))
    val dfreq = tf.groupBy("__bm_token").agg(count(lit(1)).as("__bm_df"))
    tf.join(broadcast(dfreq), "__bm_token")
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        bm25ScoreCol(col("__bm_tf"), col("__bm_df"), col("__bm_n"),
          col("__bm_len"), col("__bm_avgdl"), k1, b)
          .as("__bm_score"))
      // per-term score is a deterministic double (identical association on
      // both engines); rounding it to 6 decimals and summing as DECIMAL
      // makes the per-doc total exact and addition-order-independent, so
      // the top-k cut is stable cross-engine (the q10 decimal-sum pattern)
      .groupBy(col(idCol))
      .agg(sum(round(col("__bm_score"), 6).cast("decimal(18,6)"))
        .cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** BATCHED BM25 — a whole query TABLE answered in one plan (the lexical
    * member of the batched-serving family). `queries` carries
    * (`queryIdCol`, `queryTermsCol`: array<string>). The corpus-side
    * aggregates (token stream, doc lengths, avgdl) are computed ONCE and
    * shared by every query — the win over looping [[bm25TopK]], which
    * re-scans the corpus per query. The tf/df frames are restricted to
    * the UNION of all queries' terms (a broadcast semi-join on the
    * exploded token stream), each query then joins back only ITS OWN
    * terms' rows. Per-token df is independent of which other tokens are
    * asked about, so per-query results are IDENTICAL to the loop
    * (spec-pinned). Returns (query_id, idCol, bm25) — per-query top-k by
    * the same decimal sum + id tie-break as [[bm25TopK]].
    */
  def bm25BatchTopK(df: DataFrame, idCol: String, textCol: String,
                    queries: DataFrame, queryIdCol: String,
                    queryTermsCol: String, k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(idCol != "bm25" && idCol != "query_id",
      s"idCol '$idCol' collides with a reserved output column")
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(transform(col(queryTermsCol), lower(_))))
        .as("__bm_token"))
    val allTerms = broadcast(qterms.select("__bm_token").distinct())
    val toks = df.select(col(idCol),
      explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("__bm_token"))
    val lens = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__bm_len"))
    val stats = df.select(col(idCol)).join(lens, Seq(idCol), "left")
      .agg(count(lit(1)).as("__bm_n"),
        avg(coalesce(col("__bm_len"), lit(0L))).as("__bm_avgdl"))
    val tf = toks.join(allTerms, Seq("__bm_token"), "left_semi")
      .groupBy(col(idCol), col("__bm_token"))
      .agg(count(lit(1)).as("__bm_tf"))
    val dfreq = tf.groupBy("__bm_token").agg(count(lit(1)).as("__bm_df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("bm25").desc, col(idCol))
    tf.join(broadcast(dfreq), "__bm_token")
      .join(broadcast(qterms), "__bm_token")
      .join(lens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol),
        bm25ScoreCol(col("__bm_tf"), col("__bm_df"), col("__bm_n"),
          col("__bm_len"), col("__bm_avgdl"), k1, b)
          .as("__bm_score"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(round(col("__bm_score"), 6).cast("decimal(18,6)"))
        .cast("double").as("bm25"))
      .withColumn("__bm_rank", row_number().over(w))
      .where(col("__bm_rank") <= k).drop("__bm_rank")
  }

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
