package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Binary (1-bit) quantization for embedding columns — the most aggressive
  * point on the vector-compression spectrum (FAISS `binary` indexes,
  * Lucene/Elasticsearch BBQ, the RaBitQ family's sign-bit core): each
  * dimension keeps ONE bit — "is x_i above its per-dimension threshold" —
  * and the code packs into ⌈dim/64⌉ longs. 32× smaller than float32, and
  * the approximate distance is a HAMMING distance: XOR + popcount over the
  * packed words, the cheapest similarity primitive that exists (for
  * mean-centered data, Hamming between sign patterns is a monotone proxy
  * for angular distance — Charikar, "Similarity Estimation Techniques from
  * Rounding Algorithms", STOC 2002, with the identity hyperplanes).
  *
  * Where it sits vs the siblings: [[Sq]] (int8, 4×) is near-lossless,
  * [[Pq]] (16–32×) trades recall for trained codebooks; BQ (32×) needs no
  * codebook training beyond per-dim thresholds, scans fastest, and leans
  * hardest on the oversample+exact-rerank contract every tier here shares
  * (asymmetric serving: compressed corpus, full-precision rerank of the
  * k·oversample survivors). Scale design is the [[Sq]] one verbatim: the
  * index stores BOTH the packed code and the original vector per row; the
  * candidate pass column-prunes to (id, code) — at 100 TB the code column
  * is the 32×-less scan bandwidth that makes a full sweep affordable — and
  * only survivors read their float vectors back.
  *
  * Thresholds are the per-dimension MEAN (balanced bits — a constant
  * threshold of 0 would waste bits on any non-centered corpus), trained
  * once and frozen as a `dim`-doubles sidecar, the [[Sq]] params
  * convention: params never move under a reader; rebuild when drift
  * matters, priced by `ann_bq_recall` each round.
  */
object Bq {

  /** Per-dimension mean over the corpus: one posexplode + grouped avg
    * (map-side partial agg, `dim` result rows) — bounded driver metadata
    * under the same convention as IVF centroids and SQ (min, max).
    */
  def trainBqThresholds(corpus: DataFrame, vecCol: String): Array[Double] =
    corpus
      .select(posexplode(Vectors.toDouble(col(vecCol)))
        .as(Seq("__dim", "__x")))
      .groupBy("__dim").agg(avg("__x").as("th"))
      .orderBy("__dim")
      .collect()
      .map(_.getDouble(1))

  /** Pack the sign bits: word `w`, bit `b` is set iff
    * `x[64w+b] > threshold[64w+b]`. The per-bit `when`s are expanded
    * STATICALLY (Spark's `shiftleft` takes a literal shift, and a static
    * tree keeps the whole encode inside codegen) — this runs once per row
    * at index-build/append time, never in the serving hot path, the
    * [[Sq.quantizeExpr]] stance. Returns `array<bigint>` of ⌈dim/64⌉
    * words.
    */
  def encodeExpr(vec: Column, thresholds: Array[Double]): Column = {
    val dim = thresholds.length
    require(dim > 0, "BQ needs at least one dimension")
    val nwords = (dim + 63) / 64
    val th = typedlit(thresholds)
    val v = Vectors.toDouble(vec)
    val words = (0 until nwords).map { w =>
      (0 until 64).filter(b => w * 64 + b < dim).map { b =>
        when(element_at(v, w * 64 + b + 1) >
            element_at(th, w * 64 + b + 1), lit(1L << b))
          .otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c))
    }
    array(words: _*)
  }

  /** Hamming distance between two packed codes: XOR + popcount per word,
    * summed — `bit_count` is a native codegen'd builtin, and the fold is
    * over ⌈dim/64⌉ words (ONE for a 64-dim corpus), so the hot scan stays
    * a handful of integer ops per row.
    */
  def hammingExpr(code: Column, qcode: Column): Column =
    aggregate(
      zip_with(code, qcode, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)

  /** Materialize the BQ index: (id, vec, code) rows plus the per-dim
    * threshold sidecar. The float column rides along for rerank; the
    * candidate scan never reads it (parquet column pruning).
    */
  def writeBqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                   path: String): Unit = {
    val th = trainBqThresholds(corpus, vecCol)
    corpus.select(col(idCol), col(vecCol),
        encodeExpr(col(vecCol), th).as("code"))
      .write.mode("overwrite").parquet(s"$path/data")
    val spark = corpus.sparkSession
    import spark.implicits._
    th.indices.map(i => (i, th(i))).toDF("dim", "th")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** Append a batch with the FROZEN thresholds (the sidecar convention).
    * Drifted batches degrade recall, not correctness — rerank is exact —
    * and the degradation is priced by `ann_bq_recall`.
    */
  def appendToBqIndex(batch: DataFrame, idCol: String, vecCol: String,
                      path: String): Unit = {
    val th = readBqThresholds(batch.sparkSession, path)
    batch.select(col(idCol), col(vecCol),
        encodeExpr(col(vecCol), th).as("code"))
      .write.mode("append").parquet(s"$path/data")
  }

  /** TAKEDOWN over the BQ index: one anti-join rewrite of the flat data
    * table via the staged atomic swap ([[Sq.retractFromSqIndex]] mirror);
    * the threshold sidecar is geometry, untouched. Idempotent.
    */
  def retractFromBqIndex(spark: SparkSession, path: String,
                         ids: DataFrame, idsCol: String,
                         indexIdCol: String): Unit =
    graft.sources.Compaction.retractRows(spark, s"$path/data",
      ids.select(col(idsCol).cast("long").as("__rid")).distinct(),
      (t, k) => t(indexIdCol).cast("long") === k("__rid"))

  private[graft] def readBqThresholds(
      spark: SparkSession, path: String): Array[Double] =
    spark.read.parquet(s"$path/params").orderBy("dim").collect()
      .map(_.getDouble(1))

  /** BATCHED serving from the BQ index: the [[Sq.sqBatchTopKFromIndex]]
    * contract at 32× — candidate pass scans (id, code) only, Hamming
    * against each broadcast query's code, keeps the `k·oversample`
    * SMALLEST distances per query (ties by id), then joins the survivors
    * back to their full-precision vectors for exact cosine rerank and the
    * final top-k cut. Returns (query_id, idCol, score) with EXACT scores,
    * so any recall loss is purely candidate-set misses — the knob is
    * `oversample`, and 1 bit/dim wants it HIGHER than int8 does (16 here
    * vs SQ's 4). Lazy-takedown overlay consulted on the one data read
    * (covers candidates AND rerank).
    */
  def bqBatchTopKFromIndex(spark: SparkSession, path: String, idCol: String,
                           vecCol: String, queries: DataFrame,
                           queryIdCol: String, queryVecCol: String,
                           k: Int, oversample: Int = 16): DataFrame = {
    val th = readBqThresholds(spark, path)
    val data = spark.read.parquet(s"$path/data")
      // lazy-takedown overlay ([[graft.sources.Tombstones]])
      .transform(graft.sources.Tombstones.exclude(_, path, col(idCol)))
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      Vectors.toDouble(col(queryVecCol)).as("__qvec"),
      encodeExpr(col(queryVecCol), th).as("__qcode")))
    val wCand = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__ham").asc, col(idCol))
    val wFinal = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col(idCol))
    val cand = data.select(col(idCol), col("code"))
      .crossJoin(q.select("query_id", "__qcode"))
      .select(col("query_id"), col(idCol),
        hammingExpr(col("code"), col("__qcode")).as("__ham"))
      .withColumn("__rank", row_number().over(wCand))
      .where(col("__rank") <= k * oversample)
      .select("query_id", idCol)
    cand.join(data.select(col(idCol), col(vecCol)), idCol)
      .join(q.select("query_id", "__qvec"), "query_id")
      .select(col("query_id"), col(idCol),
        Vectors.cosine(col(vecCol), col("__qvec")).as("score"))
      .withColumn("__rank", row_number().over(wFinal))
      .where(col("__rank") <= k).drop("__rank")
  }

  /** IVF × BQ — pruning composed with maximum compression (FAISS
    * `IVFx,BIN`-shaped): the corpus laid down partitioned by Voronoi cell
    * (scan pruning) AND carrying packed sign bits (32× bandwidth), so a
    * query reads nprobe/nlist of the directories and one long-array
    * column within them. Centroids and thresholds are both frozen
    * sidecars; thresholds are GLOBAL (not per-cell) so a vector's code is
    * independent of its cell assignment — the [[Sq.writeIvfSqIndex]]
    * invariant.
    */
  def writeIvfBqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                      path: String, nlist: Int = 16,
                      kmeansIters: Int = 0): Unit = {
    val cents = Similarity.trainCentroids(corpus, idCol, vecCol, nlist,
      kmeansIters)
    val th = trainBqThresholds(corpus, vecCol)
    corpus.select(col(idCol), col(vecCol),
        encodeExpr(col(vecCol), th).as("code"),
        Similarity.bestCellFor(cents)(col(vecCol)).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/data")
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    th.indices.map(i => (i, th(i))).toDF("dim", "th")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/params")
  }

  /** BATCHED serving from the IVF×BQ index: each query soft-assigns to its
    * `nprobe` cells in-plan, the scan prunes to the union of probed cell
    * directories (parquet PartitionFilters) and column-prunes to
    * (id, code); Hamming candidates cut at `k·oversample` per query; exact
    * rerank reads the float vectors from the SAME pruned partitions. With
    * nprobe = nlist this degrades exactly to [[bqBatchTopKFromIndex]]'s
    * results (spec-pinned). Returns (query_id, idCol, score).
    */
  def ivfBqBatchTopKFromIndex(spark: SparkSession, path: String,
                              idCol: String, vecCol: String,
                              queries: DataFrame, queryIdCol: String,
                              queryVecCol: String, k: Int, nprobe: Int = 4,
                              oversample: Int = 16): DataFrame = {
    val cents = Similarity.readCentroids(spark, path)
    val th = readBqThresholds(spark, path)
    val assigned = queries.select(col(queryIdCol).as("query_id"),
      Vectors.toDouble(col(queryVecCol)).as("__qvec"),
      encodeExpr(col(queryVecCol), th).as("__qcode"),
      explode(Similarity.topCellsFor(cents, nprobe)(col(queryVecCol)))
        .as("cell"))
    val cells = assigned.select("cell").distinct().collect()
      .map(_.getLong(0))
    require(cells.nonEmpty, "IVF-BQ batch serving got an empty query table")
    val pruned = spark.read.parquet(s"$path/data")
      .where(col("cell").isin(cells.toIndexedSeq: _*)) // → parquet PartitionFilters
      // lazy-takedown overlay — covers candidates AND the rerank read
      .transform(graft.sources.Tombstones.exclude(_, path, col(idCol)))
    val wCand = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__ham").asc, col(idCol))
    val wFinal = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col(idCol))
    val candidates = pruned
      .select(col(idCol), col("cell"), col("code"))
      .join(broadcast(assigned.select("query_id", "__qcode", "cell")), "cell")
      .select(col("query_id"), col(idCol),
        hammingExpr(col("code"), col("__qcode")).as("__ham"))
      .withColumn("__rank", row_number().over(wCand))
      .where(col("__rank") <= k * oversample)
      .select("query_id", idCol)
    candidates.join(pruned.select(col(idCol), col(vecCol)), idCol)
      .join(broadcast(assigned.select("query_id", "__qvec")
        .dropDuplicates("query_id")), "query_id")
      .select(col("query_id"), col(idCol),
        Vectors.cosine(col(vecCol), col("__qvec")).as("score"))
      .withColumn("__rank", row_number().over(wFinal))
      .where(col("__rank") <= k).drop("__rank")
  }
}
