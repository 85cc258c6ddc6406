package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print one SparkEntry query's result (for eyeballing recall
  * rows and small reports without a full Verify pass).
  */
object ProbeShow {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ann_lsh_recall")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).show(50, truncate = false)
    spark.stop()
  }
}
