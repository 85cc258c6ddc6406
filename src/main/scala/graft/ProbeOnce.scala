package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: bench-like repeated timing of one SparkEntry query. */
object ProbeOnce {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_minhash")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.load(spark, sfDir, "documents").count() // scan warm-up only
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name #$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
