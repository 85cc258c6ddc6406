package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffle data once at write time so every subsequent
  * equi-join / aggregation on the bucket key is co-located — no exchange in
  * the join plan. At 100 TB this converts the recurring O(data) shuffle of a
  * fact-fact join into a one-time cost paid when the table is laid down.
  *
  * Parquet + Hive-style bucketing via `saveAsTable` (bucket metadata lives
  * in the session catalog; files are plain parquet).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a previous session's managed-table directory can survive without a
    // catalog entry (in-memory catalog, on-disk warehouse); CREATE then
    // fails with LOCATION_ALREADY_EXISTS — clear the stale location
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Join two tables bucketed on `key` with matching bucket counts; with
    * bucketing enabled (default) Catalyst plans a shuffle-free sort-merge
    * join.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
