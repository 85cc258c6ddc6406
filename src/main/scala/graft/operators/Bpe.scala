package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: deterministic merge training on a corpus
  * (sample), distributed encoding with the learned merge table broadcast.
  * Replaces the regex "subword ESTIMATE" as the real-tokenizer path for
  * training-data token accounting (the estimate stays as the cheap
  * narrow-expression twin in [[graft.functions.TextAnalysis.subwordCount]]).
  *
  * Scale design:
  *  - TRAIN: one word-frequency aggregation over the (sampled) corpus —
  *    a single hash shuffle on the word, capped at `maxWords` distinct
  *    words collected to the driver (bounded state, like IVF centroids).
  *    The merge loop itself runs over that bounded vocab, never the
  *    corpus: cost is O(vocab · numMerges), independent of corpus size.
  *  - ENCODE: a narrow per-partition pass (`mapPartitions`) with the
  *    merge ranks broadcast once per executor — no shuffle, no per-row
  *    driver involvement. mapPartitions is justified here the same way as
  *    the media codec: the merge loop is data-dependent iteration Catalyst
  *    can't express, and it sits outside the relational plan on purpose.
  *
  * Determinism: ties in pair frequency break lexicographically, the word
  * table is frequency-then-word ordered, and sampling is seeded — the same
  * corpus always yields the same merges, so encoded output is reproducible
  * run-to-run (the property every oracle in this repo leans on).
  */
object Bpe {

  /** A learned merge table, most-frequent merge first. */
  case class BpeModel(merges: Seq[(String, String)]) extends Serializable {
    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Encode one word: start from single code points, repeatedly apply
      * the LOWEST-RANK merge present (the standard BPE encode order).
      */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Seq.empty
      var parts: Vector[String] =
        word.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
      var done = parts.length < 2
      while (!done) {
        var bestRank = Int.MaxValue
        var bestIdx = -1
        var i = 0
        while (i < parts.length - 1) {
          val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          val merged = parts(bestIdx) + parts(bestIdx + 1)
          // merge EVERY occurrence of the chosen pair left-to-right
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < parts.length) {
            if (j < parts.length - 1 && parts(j) == merges(bestRank)._1 &&
                parts(j + 1) == merges(bestRank)._2) {
              out += merged; j += 2
            } else { out += parts(j); j += 1 }
          }
          parts = out.result()
          done = parts.length < 2
        }
      }
      parts
    }

    /** Encode text: lowercase, split on whitespace, concatenate per-word
      * token streams (no cross-word merges — word-internal BPE).
      */
    def encode(text: String): Seq[String] =
      if (text == null) Seq.empty
      else text.trim.toLowerCase.split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(encodeWord)
  }

  /** Train `numMerges` BPE merges on the corpus' word distribution.
    *
    * @param sampleFraction train on a seeded sample — at 100 TB the word
    *   distribution of a few-percent sample is statistically identical and
    *   the aggregation shrinks proportionally
    * @param maxWords cap on distinct words collected to the driver
    *   (frequency-ranked; bounded driver state)
    */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000, sampleFraction: Double = 1.0): BpeModel = {
    require(numMerges >= 0 && maxWords > 0)
    require(sampleFraction > 0.0 && sampleFraction <= 1.0)
    val sampled = if (sampleFraction < 1.0)
      corpus.sample(withReplacement = false, sampleFraction, seed = 42L)
    else corpus
    val wordFreq: Array[(String, Long)] = sampled
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")) // deterministic word table
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // driver-memory contract, explicit (the ANN-sidecar discipline): the
    // ONLY driver-resident state of the whole training loop is this
    // frequency-ranked word table (≤ maxWords rows, enforced by the
    // limit above and re-asserted here so a regression fails loudly) and
    // the per-step pair-count map derived from it, whose size is bounded
    // by the table's total symbol count — never by the corpus
    require(wordFreq.length <= maxWords,
      s"collected ${wordFreq.length} words > maxWords=$maxWords — " +
        "driver-memory bound violated")

    // driver-side merge loop over the BOUNDED vocab (never the corpus)
    var words: Array[(Vector[String], Long)] = wordFreq.map { case (w, n) =>
      (w.codePoints().toArray.toVector
        .map(cp => new String(Character.toChars(cp))), n)
    }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val pairFreq = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((parts, n) <- words; i <- 0 until parts.length - 1)
        pairFreq.updateWith((parts(i), parts(i + 1)))(v => Some(v.getOrElse(0L) + n))
      if (pairFreq.isEmpty) exhausted = true
      else {
        // max frequency, lexicographic tie-break — fully deterministic
        val best = pairFreq.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        words = words.map { case (parts, n) =>
          if (parts.length < 2) (parts, n)
          else {
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < parts.length) {
              if (j < parts.length - 1 && parts(j) == best._1 &&
                  parts(j + 1) == best._2) {
                out += merged; j += 2
              } else { out += parts(j); j += 1 }
            }
            (out.result(), n)
          }
        }
        m += 1
      }
    }
    BpeModel(merges.result())
  }

  case class BpeDoc(doc_id: Long, bpe_tokens: Seq[String])

  /** Encode a (doc_id, text) frame into BPE token arrays: narrow
    * per-partition pass, merge table broadcast once per executor.
    */
  def encodeDocs(df: DataFrame, idCol: String, textCol: String,
                 model: BpeModel): Dataset[BpeDoc] = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    implicit val outEnc = Encoders.product[BpeDoc]
    df.select(col(idCol).cast("long"), col(textCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .mapPartitions { it =>
        val model = bc.value
        it.map { case (id, text) => BpeDoc(id, model.encode(text)) }
      }
  }
}
