package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking (BM25)
  * with a dense one (cosine ANN) is the standard first stage of a RAG /
  * retrieval pipeline, and reciprocal rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009) is the parameter-free way to do it: each system
  * contributes `1/(c + rank)` and documents sum their contributions, so
  * agreement between systems dominates any single system's score scale.
  */
object Rank {

  /** Fuse ranked lists by RRF. Each input frame carries (`idCol`, `rank`)
    * with rank 1-based and unique within its system; a document absent
    * from a system simply contributes nothing (the standard convention).
    *
    * Determinism: the per-system contribution `1/(c + rank)` is a
    * deterministic double (integer inputs), ROUNDED to 9 decimals and
    * summed as DECIMAL — addition-order-independent, so the fused
    * ordering is bit-stable however many systems fuse or however the
    * union is partitioned (floats would make 3+-system sums depend on
    * aggregation order). Plan: one union + one grouped sum + top-k —
    * candidate-list-sized, never corpus-sized. Returns
    * (idCol, rrf_score, n_systems) cut to the top `k` by
    * (score desc, idCol).
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
              c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "RRF needs at least one ranking")
    rankings
      .map(_.select(col(idCol),
        round(lit(1.0) / (lit(c) + col("rank")), 9)
          .cast("decimal(12,9)").as("__rrf")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum("__rrf").cast("double").as("rrf_score"),
        count(lit(1)).as("n_systems"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
