package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only profiling scratch: time arbitrary sub-plans of the hot bench
  * rows in isolation (noop sink, same session shape as Bench). Not part
  * of the driver contract; used during optimization rounds to attribute
  * wall time to plan regions before changing anything.
  *
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.Probe <sfDir> <probe...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.tail.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: String)(mk: => DataFrame): Unit =
      if (which.isEmpty || which(name)) {
        // warm once, then two timed passes
        def once(): Double = {
          val t0 = System.nanoTime()
          mk.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once()
        val a = once(); val b = once()
        println(f"PROBE $name%-40s ${math.min(a, b)}%8.3f s  (passes $a%.3f/$b%.3f)")
      }

    probes(spark, sfDir).foreach { case (n, mk) => timed(n)(mk()) }
    if (which("takedown_parts")) takedownParts(spark, sfDir)
    if (which("ivf_parts")) ivfParts(spark, sfDir)
    spark.stop()
  }

  /** Time q_ivf_recluster's sub-actions one by one on a fresh staged
    * copy. */
  def ivfParts(s: SparkSession, d: String): Unit =
    (1 to 2).foreach { pass => ivfPartsOnce(s, d, pass) }

  private def ivfPartsOnce(s: SparkSession, d: String, pass: Int): Unit = {
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PART p$pass $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    SparkEntry.prepares("q_ivf_recluster")(s, d)
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_ivf_rc_work_" + d.replaceAll("[^A-Za-z0-9]", "_"))
    new java.io.File(work, "_PRISTINE").delete()
    val idx = new java.io.File(work, "idx").toString
    import org.apache.spark.sql.functions._
    t("stats.before")(graft.operators.Similarity.ivfIndexStats(s, idx)
      .select("imbalance").first())
    t("total.count")(s.read.parquet(s"$idx/data").count())
    t("recluster")(graft.operators.Similarity.reclusterIvfIndex(
      s, idx, "vec_id", "embedding", kmeansIters = 5))
    t("stats.after")(graft.operators.Similarity.ivfIndexStats(s, idx)
      .select("imbalance").first())
    t("kept.count")(s.read.parquet(s"$idx/data").count())
    val queries = s.read.parquet(s"$d/embeddings.parquet")
      .filter(pmod(col("vec_id"), lit(40)) === 0)
      .select("vec_id", "embedding")
    val truth = s.read.parquet(new java.io.File(work, "truth").toString)
    t("truth.count")(truth.count())
    t("serve.found")(truth.join(
      graft.operators.Similarity.ivfBatchTopKFromIndex(s, idx,
          "vec_id", "embedding", queries, "vec_id", "embedding",
          k = 5, nprobe = 4)
        .select("query_id", "vec_id"),
      Seq("query_id", "vec_id"), "left_semi").count())
  }

  /** Time retractDocs' sub-verbs one by one on a fresh staged copy. */
  def takedownParts(s: SparkSession, d: String): Unit = {
    import org.apache.spark.sql.functions._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PART $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    SparkEntry.prepares("q_takedown_apply")(s, d)
    val work = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_takedown_work_" + d.replaceAll("[^A-Za-z0-9]", "_"))
    new java.io.File(work, "_PRISTINE").delete()
    val corpusPath = new java.io.File(work, "corpus").toString
    val keys = s.read.parquet(s"$d/documents.parquet")
      .where(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("doc_id").cast("long").as("__rid")).distinct()
      .localCheckpoint(true)
    t("keys.count")(keys.count())
    val corpus = s.read.parquet(corpusPath)
    val docs = t("docs.checkpoint") {
      corpus.join(broadcast(keys),
          corpus("doc_id").cast("long") === col("__rid"), "left_semi")
        .localCheckpoint(true)
    }
    t("docs.count")(docs.count())
    t("text.retract")(graft.sources.TextIndex.retract(s,
      graft.sources.TextIndex.Cfg(new java.io.File(work, "ti").toString,
        partitions = 16, positional = true), docs, "doc_id", "text"))
    t("bloom.retract")(graft.sources.BloomKeyIndex.retractKeys(docs,
      graft.sources.BloomKeyIndex.Cfg(
        new java.io.File(work, "bk").toString, keyExpr = "text")))
    t("minhash.retract")(graft.operators.Dedup.retractFromMinhashIndex(
      s, new java.io.File(work, "mh").toString, keys, "__rid"))
    t("corpus.retract")(graft.sources.Compaction.retractRows(s,
      corpusPath, keys, (tt, k) => tt("doc_id").cast("long") === k("__rid")))
  }

  def probes(s: SparkSession, d: String)
      : Seq[(String, () => DataFrame)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val orders = () => Tables.load(s, d, "orders")
    // mirror of Sampling.withPoissonDraws (private) for sub-plan timing
    def base() = orders().select(
      col("o_orderkey").cast("long").as("__id"),
      col("o_totalprice").cast("decimal(18,2)").as("__v"))
    def draws(replicates: Int = 64, seed: Long = 40503L) = {
      val h1 = pmod(col("__id") * lit(2654435761L) + col("__r") * lit(seed),
        lit(4294967296L))
      val h2 = h1.bitwiseXOR(shiftright(h1, 16))
      val h3 = pmod(h2 * lit(1540483477L), lit(4294967296L))
      val h4 = h3.bitwiseXOR(shiftright(h3, 13))
      val k = graft.operators.Sampling.poisson1Cdf.zipWithIndex.foldRight(
          lit(graft.operators.Sampling.poisson1Cdf.size)
            : org.apache.spark.sql.Column) {
        case ((c, i), rest) => when(col("__u") < lit(c), lit(i))
          .otherwise(rest)
      }
      base()
        .withColumn("__r", explode(sequence(lit(0), lit(replicates - 1))))
        .withColumn("__u", h4.cast("double") / lit(4294967296.0))
        .withColumn("__k", k)
    }
    Seq(
      "orders_scan2col" -> (() =>
        orders().select(col("o_orderkey"), col("o_totalprice"))),
      "inflate_only" -> (() => base().withColumn("__r",
        explode(sequence(lit(0), lit(63))))),
      "draws_only" -> (() => draws()),
      "draws_agg_r" -> (() => draws().groupBy("__r")
        .agg(sum(col("__k") * col("__v")).as("s"), sum("__k").as("k"))),
      "draws_agg_r_long" -> (() => draws()
        .withColumn("__vl", (col("__v") * 100).cast("long"))
        .groupBy("__r")
        .agg(sum(col("__k") * col("__vl")).as("s"), sum("__k").as("k"))),
      "quantile_window" -> (() => {
        val inflated = draws().select(col("__r"), col("__id"), col("__v"),
            col("__k"))
          .unionAll(base().select(lit(-1).as("__r"), col("__id"),
            col("__v"), lit(1).as("__k")))
        val run = Window.partitionBy("__r").orderBy(col("__v"), col("__id"))
        val all = Window.partitionBy("__r")
        inflated
          .withColumn("__cum", sum("__k").over(run))
          .withColumn("__tot", sum("__k").over(all))
          .where(col("__tot") > 0 &&
            col("__cum") * lit(2) >= col("__tot") * lit(1))
          .groupBy("__r")
          .agg(min("__v").as("__q"), max("__tot").as("__t"))
      }),
      "bq_full" -> (() => graft.operators.Sampling
        .poissonBootstrapQuantile(orders(), "o_orderkey", "o_totalprice",
          qNum = 1, qDen = 2)),
      "bci_full" -> (() => graft.operators.Sampling
        .poissonBootstrap(orders(), "o_orderkey", "o_totalprice", 64)),
      "w_sort_only" -> (() => draws()
        .select(col("__r"), col("__id"), col("__v"), col("__k"))
        .repartition(col("__r"))
        .sortWithinPartitions(col("__v"), col("__id"))),
      "w_cum_only" -> (() => {
        val run = Window.partitionBy("__r").orderBy(col("__v"), col("__id"))
        draws().select(col("__r"), col("__id"), col("__v"), col("__k"))
          .withColumn("__cum", sum("__k").over(run))
      }),
      "w_cum_long" -> (() => {
        // long cents instead of decimal through the sort+window
        val run = Window.partitionBy("__r").orderBy(col("__vl"), col("__id"))
        draws()
          .select(col("__r"), col("__id"),
            (col("__v") * 100).cast("long").as("__vl"), col("__k"))
          .withColumn("__cum", sum("__k").over(run))
      }),
      "w_both_long" -> (() => {
        val run = Window.partitionBy("__r").orderBy(col("__vl"), col("__id"))
        val all = Window.partitionBy("__r")
        draws()
          .select(col("__r"), col("__id"),
            (col("__v") * 100).cast("long").as("__vl"), col("__k"))
          .withColumn("__cum", sum("__k").over(run))
          .withColumn("__tot", sum("__k").over(all))
          .where(col("__tot") > 0 &&
            col("__cum") * lit(2) >= col("__tot") * lit(1))
          .groupBy("__r")
          .agg(min("__vl").as("__q"), max("__tot").as("__t"))
      })
    )
  }
}
