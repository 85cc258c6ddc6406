package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranking-quality metrics over retrieval results — the eval harness for
  * the engine's own retrieval family (BM25 / dense / hybrid RRF): given a
  * ranked result table and a relevance-judgment table, per-query
  * nDCG@k, MRR@k, precision@k and recall@k in one grouped aggregation.
  *
  * Conventions (binary or graded relevance both work):
  *  - `ranked` carries (queryCol, docCol, rankCol) with rank 1 = best —
  *    the shape every `*TopK` operator in this engine already returns (or
  *    one row_number away from it);
  *  - `rel` carries (queryCol, docCol, gainCol); pairs absent from `rel`
  *    have gain 0. Binary judgments use gain 1.
  *  - DCG uses the classic form Σ gain_i / log2(i + 1); IDCG ranks each
  *    query's judged gains descending (ties don't matter — equal gains
  *    contribute equally under any tie order, so the metric stays
  *    deterministic cross-engine).
  *
  * Scale shape: one left join of the top-k slice against the judgment
  * table (both keyed (query, doc) — co-partitioned), one window over the
  * judgments for IDCG (keyed by query, bounded by judgments per query),
  * one grouped agg. Nothing touches the corpus; the eval cost scales with
  * |queries| · k + |judgments|, not with collection size.
  */
object RankEval {

  /** Per-query metrics of `ranked` against `rel` at cutoff `k`. Returns
    * (queryCol, ndcg, mrr, precision, recall) — one row per query that
    * appears in `ranked`; queries with no judged-relevant documents score
    * ndcg/mrr/precision/recall 0 by the usual convention (nothing was
    * findable, nothing was found).
    */
  def metricsAtK(ranked: DataFrame, queryCol: String, docCol: String,
                 rankCol: String, rel: DataFrame, gainCol: String,
                 k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(!Seq("ndcg", "mrr", "precision", "recall").contains(queryCol),
      s"queryCol '$queryCol' collides with a RankEval output column")
    // ideal DCG per query: judged gains ranked descending, discounted at
    // their ideal positions, summed over the first k
    val iw = Window.partitionBy(queryCol)
      .orderBy(col(gainCol).desc, col(docCol))
    val idcg = rel.where(col(gainCol) > 0)
      .withColumn("__re_i", row_number().over(iw))
      .where(col("__re_i") <= k)
      .groupBy(queryCol)
      .agg(sum(col(gainCol).cast("double") /
          log(2.0, col("__re_i") + 1)).as("__re_idcg"),
        count(lit(1)).as("__re_njudged"))
    // total relevant per query (recall denominator — NOT capped at k)
    val nrel = rel.where(col(gainCol) > 0)
      .groupBy(queryCol).agg(count(lit(1)).as("__re_nrel"))
    ranked.where(col(rankCol) <= k)
      .join(rel.select(col(queryCol), col(docCol),
        col(gainCol).as("__re_g")), Seq(queryCol, docCol), "left")
      .select(col(queryCol), col(rankCol),
        coalesce(col("__re_g"), lit(0)).cast("double").as("__re_g"))
      .groupBy(queryCol)
      .agg(
        sum(col("__re_g") / log(2.0, col(rankCol) + 1)).as("__re_dcg"),
        max(when(col("__re_g") > 0, lit(1.0) / col(rankCol))
          .otherwise(lit(0.0))).as("mrr"),
        sum((col("__re_g") > 0).cast("int")).as("__re_hits"),
        count(lit(1)).as("__re_returned"))
      .join(idcg, Seq(queryCol), "left")
      .join(nrel, Seq(queryCol), "left")
      .select(col(queryCol),
        when(coalesce(col("__re_idcg"), lit(0.0)) > 0,
          col("__re_dcg") / col("__re_idcg")).otherwise(lit(0.0)).as("ndcg"),
        col("mrr"),
        (col("__re_hits").cast("double") / col("__re_returned"))
          .as("precision"),
        when(coalesce(col("__re_nrel"), lit(0L)) > 0,
          col("__re_hits").cast("double") / col("__re_nrel"))
          .otherwise(lit(0.0)).as("recall"))
  }

  /** Macro-averaged summary of [[metricsAtK]]: one row
    * (n_queries, ndcg, mrr, precision, recall), each metric the unweighted
    * mean over queries — the number a retrieval benchmark reports.
    */
  def summaryAtK(ranked: DataFrame, queryCol: String, docCol: String,
                 rankCol: String, rel: DataFrame, gainCol: String,
                 k: Int): DataFrame =
    metricsAtK(ranked, queryCol, docCol, rankCol, rel, gainCol, k)
      .agg(count(lit(1)).as("n_queries"),
        avg("ndcg").as("ndcg"), avg("mrr").as("mrr"),
        avg("precision").as("precision"), avg("recall").as("recall"))
}
