package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: which decoration of dedup_minhash costs what. */
object ProbeOnce {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def op() = operators.Dedup.minhashLsh(docs, "doc_id", "text",
      persistIntermediates = false)
    (1 to 2).foreach { i =>
      time(s"bare #$i")(noop(op()))
      time(s"round #$i")(noop(op()
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))))
      time(s"sort #$i")(noop(op()
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")))
      time(s"fresh-docs sort #$i")(noop(
        SparkEntry.queries("dedup_minhash")(spark, sfDir)))
    }
    spark.stop()
  }
}
