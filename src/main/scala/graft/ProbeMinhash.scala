package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: repeated timing of the MinHash LSH operator. */
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
    (1 to 3).foreach { i =>
      val pairs = time(s"full minhashLsh #$i")(
        operators.Dedup.minhashLsh(docs, "doc_id", "text").count())
      println(s"  pairs: $pairs")
    }
    (1 to 2).foreach { i =>
      val pairs = time(s"no-persist minhashLsh #$i")(
        operators.Dedup.minhashLsh(docs, "doc_id", "text",
          persistIntermediates = false).count())
      println(s"  pairs: $pairs")
    }
    spark.stop()
  }
}
