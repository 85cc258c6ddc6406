package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.HashedShingles.hashedShingles

/** Dev probe: stage-by-stage timing of the MinHash LSH pipeline. */
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("warmup count")(docs.count())
    time("shingle extraction only")(
      docs.select(explode(hashedShingles(col("text"), 5))).count())
    val pairs = time("full minhashLsh")(
      operators.Dedup.minhashLsh(docs, "doc_id", "text").count())
    println(s"verified pairs: $pairs")
    // candidates only (re-run of the front half)
    time("2nd full run (warm)")(
      operators.Dedup.minhashLsh(docs, "doc_id", "text").count())
    spark.stop()
  }
}
