package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Scalar (int8) quantization for embedding columns — the simplest and
  * most widely deployed vector-compression scheme (FAISS `SQ8`,
  * Lucene/Elasticsearch `int8_hnsw` storage): each dimension is affinely
  * mapped to one signed byte using per-dimension (min, max) trained on the
  * corpus. 4× smaller than float32 at near-lossless recall, sitting
  * between the exact float path and PQ's 16–32× in the compression
  * spectrum (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011, introduces the asymmetric-distance setup this
  * follows: full-precision query vs compressed corpus).
  *
  * Scale design: the index stores BOTH the byte codes and the original
  * vector per row. The approximate scoring pass column-prunes to
  * (id, code) — at 100 TB the code column is 4× smaller on disk and in
  * scan cache than the float column, which is the read-bandwidth win —
  * and only the `k·oversample` surviving candidates per query are joined
  * back to their full vectors for exact rerank. SQ is a COMPRESSION
  * scheme, not a pruning scheme: it composes with IVF cell partitioning
  * (quantize within each cell's directory) when scan pruning is also
  * wanted; standalone it is the honest full-scan-but-4×-cheaper baseline.
  *
  * Train stats are 2·dim doubles — bounded driver metadata under the same
  * convention as IVF centroids and PQ codebooks.
  */
object Sq {

  /** Per-dimension (min, max) over the corpus: one explode + grouped
    * min/max (map-side partial agg, `dim` result rows), collected as
    * bounded metadata.
    */
  def trainSqParams(corpus: DataFrame,
                    vecCol: String): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(Vectors.toDouble(col(vecCol)))
        .as(Seq("__dim", "__x")))
      .groupBy("__dim").agg(min("__x").as("mn"), max("__x").as("mx"))
      .orderBy("__dim")
      .collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Quantize: `code_i = round(clamp((x_i − mn_i)/span_i, 0, 1)·255) − 128`
    * ∈ [−128, 127] (a true int8 domain). Zero-span dimensions map to −128.
    * Interpreted HOF — runs ONCE per row at index-build/append time, never
    * in the serving hot path.
    */
  def quantizeExpr(vec: Column, mins: Array[Double],
                   maxs: Array[Double]): Column = {
    val minsL = typedlit(mins)
    val spansL = typedlit(mins.indices.map { i =>
      val s = maxs(i) - mins(i); if (s > 0) s else 1.0
    }.toArray)
    transform(Vectors.toDouble(vec), (x, i) =>
      (round(least(greatest(
          (x - element_at(minsL, i + 1)) / element_at(spansL, i + 1),
          lit(0.0)), lit(1.0)) * 255) - 128).cast("int"))
  }

  /** Reconstruction: `x̂_i = mn_i + (code_i + 128)/255 · span_i` — the
    * asymmetric-scoring side (query stays full-precision).
    */
  def dequantizeExpr(code: Column, mins: Array[Double],
                     maxs: Array[Double]): Column = {
    val minsL = typedlit(mins)
    val spansL = typedlit(mins.indices.map { i =>
      val s = maxs(i) - mins(i); if (s > 0) s else 1.0
    }.toArray)
    transform(code, (c, i) =>
      element_at(minsL, i + 1) +
        (c + 128).cast("double") / 255.0 * element_at(spansL, i + 1))
  }

  /** Materialize the SQ8 index: (id, vec, code) rows plus the per-dim
    * (min, max) params sidecar. The float column rides along for rerank;
    * scoring scans never read it (parquet column pruning).
    */
  def writeSqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   path: String): Unit = {
    val (mins, maxs) = trainSqParams(corpus, vecCol)
    corpus.select(col(idCol), col(vecCol),
        quantizeExpr(col(vecCol), mins, maxs).as("code"))
      .write.mode("overwrite").parquet(s"$path/data")
    val spark = corpus.sparkSession
    import spark.implicits._
    mins.indices.map(i => (i, mins(i), maxs(i))).toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** Append a batch with the FROZEN train params (the sidecar convention:
    * params never move under a reader; rebuild when drift matters).
    * Out-of-range values clamp to the byte domain — the documented SQ
    * failure mode drift causes, priced by `ann_sq8_recall` each round.
    */
  def appendToSqIndex(batch: DataFrame, idCol: String, vecCol: String,
                      path: String): Unit = {
    val (mins, maxs) = readSqParams(batch.sparkSession, path)
    batch.select(col(idCol), col(vecCol),
        quantizeExpr(col(vecCol), mins, maxs).as("code"))
      .write.mode("append").parquet(s"$path/data")
  }

  /** TAKEDOWN over the SQ8 index: one anti-join rewrite of the
    * unpartitioned data table (codes + floats, O(index)) via the staged
    * atomic swap; the (min, max) params sidecar is geometry, untouched.
    * Idempotent (absent ids are a no-op).
    */
  def retractFromSqIndex(spark: SparkSession, path: String,
                         ids: DataFrame, idsCol: String,
                         indexIdCol: String): Unit =
    graft.sources.Compaction.retractRows(spark, s"$path/data",
      ids.select(col(idsCol).cast("long").as("__rid")).distinct(),
      (t, k) => t(indexIdCol).cast("long") === k("__rid"))

  private[graft] def readSqParams(
      spark: SparkSession, path: String): (Array[Double], Array[Double]) = {
    val rows = spark.read.parquet(s"$path/params").orderBy("dim").collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** BATCHED serving from the materialized SQ8 index: one plan for a whole
    * query table. Approximate pass scans (id, code) only — dequantized
    * cosine against each broadcast query — keeps the top `k·oversample`
    * per query (window), then joins the surviving candidates back to
    * their full-precision vectors for exact rerank and the final top-k
    * cut. Job count independent of batch size. Returns
    * (query_id, idCol, score) with EXACT scores (rerank output), so any
    * recall loss is purely candidate-set misses.
    */
  /** IVF × SQ8 — pruning composed with compression, the canonical
    * billion-vector serving layout (FAISS `IVFx,SQ8`): the corpus is laid
    * down partitioned by Voronoi cell (scan pruning) AND carries int8
    * codes (bandwidth compression), so a query reads nprobe/nlist of the
    * directories and only the code column within them. Centroids and SQ
    * params are both frozen sidecars; SQ params are GLOBAL (not per-cell)
    * so a vector's code is independent of its cell assignment.
    */
  def writeIvfSqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      path: String, nlist: Int = 16,
                      kmeansIters: Int = 0): Unit = {
    val cents = Similarity.trainCentroids(corpus, idCol, vecCol, nlist,
      kmeansIters)
    val (mins, maxs) = trainSqParams(corpus, vecCol)
    corpus.select(col(idCol), col(vecCol),
        quantizeExpr(col(vecCol), mins, maxs).as("code"),
        Similarity.bestCellFor(cents)(col(vecCol)).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/data")
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    mins.indices.map(i => (i, mins(i), maxs(i))).toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** BATCHED serving from the IVF×SQ8 index: each query row soft-assigns
    * to its `nprobe` cells in-plan, the scan is pruned to the UNION of
    * probed cell directories (parquet PartitionFilters) and column-pruned
    * to (id, code); the equi-join on `cell` restricts every query to ITS
    * OWN cells; dequantized-cosine candidates cut at `k·oversample` per
    * query; exact rerank reads the float vectors from the SAME pruned
    * partitions (candidates only come from probed cells). With
    * nprobe = nlist this degrades exactly to [[sqBatchTopKFromIndex]]'s
    * results (spec-pinned). Returns (query_id, idCol, score).
    */
  def ivfSqBatchTopKFromIndex(spark: SparkSession, path: String,
                              idCol: String, vecCol: String,
                              queries: DataFrame, queryIdCol: String,
                              queryVecCol: String, k: Int, nprobe: Int = 4,
                              oversample: Int = 4): DataFrame = {
    val cents = Similarity.readCentroids(spark, path)
    val (mins, maxs) = readSqParams(spark, path)
    val assigned = queries.select(col(queryIdCol).as("query_id"),
      Vectors.toDouble(col(queryVecCol)).as("__qvec"),
      explode(Similarity.topCellsFor(cents, nprobe)(col(queryVecCol)))
        .as("cell"))
    // the batch's probed cell set — bounded by min(nlist, batch·nprobe)
    val cells = assigned.select("cell").distinct().collect()
      .map(_.getLong(0))
    require(cells.nonEmpty, "IVF-SQ batch serving got an empty query table")
    val pruned = spark.read.parquet(s"$path/data")
      .where(col("cell").isin(cells.toIndexedSeq: _*)) // → parquet PartitionFilters
      // lazy-takedown overlay — covers candidates AND the rerank read
      .transform(graft.sources.Tombstones.exclude(_, path, col(idCol)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col(idCol))
    val candidates = pruned
      .select(col(idCol), col("cell"),
        dequantizeExpr(col("code"), mins, maxs).as("__xhat"))
      .join(broadcast(assigned), "cell")
      .select(col("query_id"), col(idCol),
        Vectors.cosine(col("__xhat"), col("__qvec")).as("score"))
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k * oversample)
      .select("query_id", idCol)
    candidates.join(pruned.select(col(idCol), col(vecCol)), idCol)
      .join(broadcast(assigned.select("query_id", "__qvec")
        .dropDuplicates("query_id")), "query_id")
      .select(col("query_id"), col(idCol),
        Vectors.cosine(col(vecCol), col("__qvec")).as("score"))
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k).drop("__rank")
  }

  def sqBatchTopKFromIndex(spark: SparkSession, path: String, idCol: String,
                           vecCol: String, queries: DataFrame,
                           queryIdCol: String, queryVecCol: String,
                           k: Int, oversample: Int = 4): DataFrame = {
    val (mins, maxs) = readSqParams(spark, path)
    val data = spark.read.parquet(s"$path/data")
      // lazy-takedown overlay ([[graft.sources.Tombstones]])
      .transform(graft.sources.Tombstones.exclude(_, path, col(idCol)))
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      Vectors.toDouble(col(queryVecCol)).as("__qvec")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col(idCol))
    val cand = data.select(col(idCol),
        dequantizeExpr(col("code"), mins, maxs).as("__xhat"))
      .crossJoin(q)
      .select(col("query_id"), col(idCol),
        Vectors.cosine(col("__xhat"), col("__qvec")).as("score"))
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k * oversample)
      .select("query_id", idCol)
    cand.join(data.select(col(idCol), col(vecCol)), idCol)
      .join(q, "query_id")
      .select(col("query_id"), col(idCol),
        Vectors.cosine(col(vecCol), col("__qvec")).as("score"))
      .withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k).drop("__rank")
  }
}
