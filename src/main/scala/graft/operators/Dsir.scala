package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, DSIR) —
  * select raw pretraining documents that LOOK LIKE a curated target
  * corpus, by importance weight under two bag-of-bigram-features models:
  *
  *   log w(d) = Σ_{g ∈ bigrams(d)} [ ln p̂_target(g) − ln q̂_raw(g) ]
  *
  * with both feature distributions add-one smoothed over the UNION feature
  * vocabulary (p̂(g) = (c(g)+1)/(N+V)) — the same smoothing convention as
  * [[Lm.bigramPerplexity]], so unseen-in-target features degrade to the
  * floor instead of zeroing the product. High-weight documents are the
  * ones the target distribution assigns relatively more mass than the raw
  * distribution — "select me" evidence; resampling = take the weight-top
  * slice (deterministic here; the paper adds Gumbel noise, which is a
  * seeded per-row expression if sampling diversity matters).
  *
  * Spark shape, all joins — no driver model state:
  *  - both corpora stream through ONE tokenize + bigram explode each
  *    (engine-standard lower+trim+`\s+` tokens, identical to Lm/TF-IDF,
  *    so the DuckDB twin reuses proven SQL);
  *  - feature-count tables are grouped aggregations (map-side combined,
  *    sublinear by Heaps' law), totals/vocab one broadcast row;
  *  - per-doc weight = the raw corpus's own bigram stream joined against
  *    the two count tables + one keyed sum.
  *
  * The paper hashes features into a bounded dimension; `buckets > 0`
  * applies that (xxhash64 mod buckets — count tables bounded at `buckets`
  * rows regardless of corpus scale, the knob for a 100 TB raw sweep where
  * even Heaps-sublinear string tables get big). Hash-bucketed weights are
  * approximate (collisions pool counts), so the bucketed path is priced
  * against the exact selection by `dsir_hashed_gap`'s floor; `buckets = 0`
  * keeps exact string features and is the oracle-checked path.
  */
object Dsir {

  private def toks(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")

  private def bigrams(w: Column): Column =
    transform(sequence(lit(1), size(w) - 1),
      i => struct(element_at(w, i).as("p"), element_at(w, i + 1).as("n")))

  /** Feature stream: one row per bigram occurrence, feature key `g`
    * (exact "p n" string, or its hash bucket when `buckets > 0`).
    */
  private def feats(df: DataFrame, textCol: String, buckets: Int,
                    cols: Column*): DataFrame = {
    val g = concat_ws(" ", col("__ds_bg.p"), col("__ds_bg.n"))
    df.withColumn("__ds_w", toks(col(textCol)))
      .where(size(col("__ds_w")) >= 2)
      .select((explode(bigrams(col("__ds_w"))).as("__ds_bg") +: cols): _*)
      .select(((if (buckets > 0) pmod(xxhash64(g), lit(buckets.toLong))
                else g).as("g") +: cols): _*)
  }

  private def guard(df: DataFrame, idCol: String): Unit = {
    require(!df.columns.exists(_.startsWith("__ds_")),
      "input already carries __ds_-prefixed internals")
    require(!Seq("g", "n_feats", "logw").contains(idCol),
      s"idCol '$idCol' collides with a Dsir internal or output column")
  }

  /** The two fitted feature models as three frames: target counts
    * (g, __ds_ct), raw counts (g, __ds_cr), totals (1 row: __ds_v union
    * vocabulary, __ds_nt, __ds_nr mass).
    */
  private def fit(raw: DataFrame, target: DataFrame, textCol: String,
                  buckets: Int): (DataFrame, DataFrame, DataFrame) = {
    val ct = feats(target, textCol, buckets).groupBy("g")
      .agg(count(lit(1)).as("__ds_ct"))
    val cr = feats(raw, textCol, buckets).groupBy("g")
      .agg(count(lit(1)).as("__ds_cr"))
    // smoothing vocabulary = the UNION feature space of both corpora, so
    // both models are distributions over the same support; totals ride the
    // same single broadcast row
    val totals = ct.join(cr, Seq("g"), "full")
      .agg(count(lit(1)).as("__ds_v"),
        coalesce(sum("__ds_ct"), lit(0L)).as("__ds_nt"),
        coalesce(sum("__ds_cr"), lit(0L)).as("__ds_nr"))
    (ct, cr, totals)
  }

  private def score(docs: DataFrame, idCol: String, textCol: String,
                    buckets: Int, ct: DataFrame, cr: DataFrame,
                    totals: DataFrame): DataFrame =
    feats(docs, textCol, buckets, col(idCol))
      .join(ct, Seq("g"), "left")
      .join(cr, Seq("g"), "left") // misses only when scoring a FRESH batch
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (log((coalesce(col("__ds_ct"), lit(0L)) + 1.0) /
            (col("__ds_nt") + col("__ds_v"))) -
          log((coalesce(col("__ds_cr"), lit(0L)) + 1.0) /
            (col("__ds_nr") + col("__ds_v")))).as("__ds_lw"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        sum(col("__ds_lw")).as("logw"))

  /** Per-document log importance weight of every `raw` document with ≥ 1
    * bigram feature (documents under two tokens carry no evidence and are
    * omitted — the [[Lm]] policy). Returns (idCol, n_feats, logw).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 0): DataFrame = {
    guard(raw, idCol); guard(target, idCol)
    val (ct, cr, totals) = fit(raw, target, textCol, buckets)
    score(raw, idCol, textCol, buckets, ct, cr, totals)
  }

  /** Materialize the fitted pair of feature models as an index sidecar
    * (the [[Lm.writeLmIndex]] pattern): target/raw count tables plus the
    * one-row totals, with the bucket arity recorded so scoring can't
    * silently hash into a different feature space than the build.
    * Built ONCE from a curated target sample and a raw-source sample,
    * then FROZEN — the corpus loop scores every batch against it without
    * refitting, so selection decisions are stable across the corpus
    * lifetime (the paper fits both models once, up front, for the same
    * reason).
    */
  def writeDsirIndex(raw: DataFrame, target: DataFrame, textCol: String,
                     path: String, buckets: Int = 0): Unit = {
    val (ct, cr, totals) = fit(raw, target, textCol, buckets)
    ct.write.mode("overwrite").parquet(s"$path/target_counts")
    cr.write.mode("overwrite").parquet(s"$path/raw_counts")
    val spark = raw.sparkSession
    import spark.implicits._
    totals.crossJoin(Seq(buckets).toDF("__ds_buckets"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/totals")
  }

  /** Score a fresh batch against a FROZEN materialized index — the exact
    * [[importanceWeights]] plan with the fitting aggregations replaced by
    * sidecar reads. Features unseen at fit time degrade to both models'
    * smoothing floors via the left joins (a constant
    * ln((nr+v)/(nt+v)) contribution — no refit, no vocabulary drift).
    */
  def weightsAgainstIndex(docs: DataFrame, idCol: String, textCol: String,
                          path: String): DataFrame = {
    guard(docs, idCol)
    val spark = docs.sparkSession
    val totalsAll = spark.read.parquet(s"$path/totals")
    val buckets = totalsAll.select("__ds_buckets").collect().head.getInt(0)
    score(docs, idCol, textCol, buckets,
      spark.read.parquet(s"$path/target_counts"),
      spark.read.parquet(s"$path/raw_counts"),
      totalsAll.drop("__ds_buckets"))
  }

  /** The resampling step: the `n` highest-weight raw documents
    * (deterministic weight-top-n; ties broken by id). The sort sees only
    * (id, weight) pairs — TakeOrderedAndProject, never a full-corpus
    * shuffle of documents.
    */
  def selectTop(raw: DataFrame, target: DataFrame, idCol: String,
                textCol: String, n: Int, buckets: Int = 0): DataFrame =
    importanceWeights(raw, target, idCol, textCol, buckets)
      .orderBy(col("logw").desc, col(idCol))
      .limit(n)
}
