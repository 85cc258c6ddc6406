package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design (100 TB / billions of vectors):
  *  - Brute-force top-k is a single narrow scan (score every vector with a
  *    broadcast query) followed by a TakeOrderedAndProject — no shuffle of
  *    the vectors themselves, and the per-partition top-k means only k rows
  *    per partition reach the driver-side merge.
  *  - The LSH path buckets vectors by random-hyperplane signature; a query
  *    probes only its own buckets (an equi-join on the bucket key), turning
  *    the scan into a hash-partition-pruned lookup. Bucket assignment is a
  *    pure expression, so the bucketed table can be written once
  *    (partitioned/bucketed by `bucket`) and reused by every query.
  */
object Similarity {

  /** Exact top-k by cosine similarity against a single query vector, given
    * as a 1-row DataFrame (broadcast — the corpus never moves).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     query: DataFrame, queryVecCol: String, k: Int): DataFrame =
    corpus
      .crossJoin(broadcast(query.select(col(queryVecCol).as("__qvec"))))
      .select(col(idCol),
        Vectors.cosine(col(vecCol), col("__qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Adds the LSH bucket column(s): one per hash table. */
  def withLshBuckets(df: DataFrame, vecCol: String,
                     nBits: Int = 12, tables: Int = 4): DataFrame =
    (0 until tables).foldLeft(df) { (d, t) =>
      d.withColumn(s"bucket_$t",
        Vectors.hyperplaneBucket(col(vecCol), nBits, tableSeed = t))
    }

  /** Approximate top-k: candidates = union over hash tables of vectors in
    * the query's bucket, reranked exactly. Recall grows with `tables`;
    * cost per query is |bucket| × tables instead of |corpus|.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, queryVecCol: String, k: Int,
              nBits: Int = 12, tables: Int = 4): DataFrame = {
    val bucketed = withLshBuckets(corpus, vecCol, nBits, tables)
    val q = withLshBuckets(query.select(col(queryVecCol).as("__qvec")),
        "__qvec", nBits, tables)
      .select(col("__qvec") +:
        (0 until tables).map(t => col(s"bucket_$t").as(s"qbucket_$t")): _*)
    val probes = (0 until tables).map { t =>
      bucketed.join(broadcast(q), col(s"bucket_$t") === col(s"qbucket_$t"))
        .select(col(idCol), col(vecCol), col("__qvec"))
    }
    probes.reduce(_ unionByName _)
      .dropDuplicates(idCol)
      .select(col(idCol), Vectors.cosine(col(vecCol), col("__qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** IVF-style ANN: partition the corpus into `nlist` Voronoi cells around
    * deterministic seed centroids (the lowest-id vectors — a k-means round
    * would refine them; seeds keep the operator fully deterministic), search
    * only the query's `nprobe` nearest cells, rerank exactly.
    *
    * Scale shape: assignment is one broadcast pass (corpus × nlist dots,
    * narrow); the assigned table can be written partitioned by `cell` so a
    * query reads only nprobe partitions — the classic IVF pruning, expressed
    * as partition pruning.
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, queryVecCol: String, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    // assign every vector to its max-dot centroid
    val scored = corpus.crossJoin(broadcast(centroids))
      .select(col(idCol), col(vecCol), col("cid"),
        Vectors.dot(col(vecCol), col("cvec")).as("cscore"))
    val wAssign = Window.partitionBy(col(idCol))
      .orderBy(col("cscore").desc, col("cid"))
    val assigned = scored
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("cid").as("cell"))
    // the query probes its nprobe nearest cells
    val probes = query.select(col(queryVecCol).as("__qvec"))
      .crossJoin(broadcast(centroids))
      .select(col("__qvec"), col("cid"),
        Vectors.dot(col("__qvec"), col("cvec")).as("cscore"))
      .orderBy(col("cscore").desc, col("cid"))
      .limit(nprobe)
      .select(col("__qvec"), col("cid").as("cell"))
    assigned.join(broadcast(probes), "cell")
      .select(col(idCol), Vectors.cosine(col(vecCol), col("__qvec")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Exact near-duplicate pairs by cosine ≥ threshold. `blockCols` (e.g. a
    * coarse LSH bucket or a label) bound the quadratic blow-up: the join is
    * an equi-join on the block key. Pass an empty Seq for the (small-data
    * only) full cross product.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double,
                         blockCols: Seq[Column] = Seq.empty): DataFrame = {
    // cast + norm once per VECTOR, carried through the join as scalar
    // columns; per-pair work is exactly one dot product. The arithmetic
    // stays dot/(nā·nb̄) so results are bit-identical to the naive form.
    val base = df.select(col(idCol) +:
      Vectors.toDouble(col(vecCol)).as("v") +:
      blockCols.zipWithIndex.map { case (c, i) => c.as(s"blk_$i") }: _*)
      .withColumn("nrm", Vectors.l2Norm(col("v")))
    val blkNames = blockCols.indices.map(i => s"blk_$i")
    val a = base.select(col(idCol).as("id_a") +: col("v").as("v_a") +:
      col("nrm").as("nrm_a") +: blkNames.map(col): _*)
    val b = base.select(col(idCol).as("id_b") +: col("v").as("v_b") +:
      col("nrm").as("nrm_b") +: blkNames.map(col): _*)
    val joined =
      if (blkNames.isEmpty) a.crossJoin(b)
      else a.join(b, blkNames.toSeq)
    val denom = col("nrm_a") * col("nrm_b")
    joined.where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        when(denom === 0, lit(null))
          .otherwise(Vectors.dot(col("v_a"), col("v_b")) / denom)
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }
}
