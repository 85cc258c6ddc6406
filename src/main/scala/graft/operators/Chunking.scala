package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking — split each document into overlapping
  * fixed-token windows, the prep step feeding both pretraining packers and
  * RAG indexers: chunk k covers words [k·stride + 1, k·stride + chunk]
  * (stride = chunk − overlap), and the chunk count is
  * 1 + ⌈max(0, len − chunk) / stride⌉ — one chunk for short docs, a final
  * partial chunk otherwise, never a tail chunk fully contained in its
  * predecessor.
  *
  * Scale shape: pure per-row arithmetic + one explode — no shuffle, no
  * window function, no driver state; output order is (id, chunk_idx) by
  * construction. The words array is staged as a real column before the
  * `transform` lambda (lambda-referenced expressions re-evaluate per
  * element — an unstaged split() would re-split per chunk).
  */
object Chunking {

  /** One row per chunk: (idCol, chunk_idx, chunk_text, n_chunk_tokens). */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val words: Column = col("__ck_words")
    val len: Column = size(words)
    // 1 + ceil(max(0, len - chunk) / stride), in integer arithmetic both
    // engines share: ceil(a/b) = (a + b - 1) div b for a >= 0
    val nChunks =
      (lit(1) + floor((greatest(len - chunkTokens, lit(0)) + (stride - 1))
        / stride).cast("int")).as("__ck_n")
    df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__ck_words"))
      .select(col(idCol), words, nChunks)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__ck_n") - 1),
          k => struct(
            array_join(slice(words, k * stride + 1, lit(chunkTokens)), " ")
              .as("t"),
            size(slice(words, k * stride + 1, lit(chunkTokens))).cast("long")
              .as("n")))))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        col("col.t").as("chunk_text"),
        col("col.n").as("n_chunk_tokens"))
  }
}
