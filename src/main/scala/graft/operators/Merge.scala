package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Keyed upsert (CDC-style merge) for immutable columnar storage: vanilla
  * Spark-on-parquet has no MERGE INTO, so the operator is the classic
  * union + keep-latest-per-key window. One shuffle on the key columns —
  * the minimum for a keyed merge; the window needs no extra exchange
  * because it partitions by the same key.
  *
  * At 100 TB the refinement is partition-scoped merging
  * ([[keepLatestPartitioned]]): restrict `base` to the partitions that
  * actually contain updated keys (pruned at the parquet scan) and rewrite
  * only those via dynamic partition overwrite — the merge cost then scales
  * with the touched-partition volume, not the corpus. The keep-latest
  * semantics are unchanged by that optimization.
  */
object Merge {

  /** One row per `keyCols` value: the row with the highest `versionCol`,
    * preferring `updates` over `base` on equal versions (so replaying an
    * already-applied batch is a no-op that still lands on the update row —
    * idempotent re-delivery). Both inputs must share a schema.
    *
    * Determinism contract (the house rule — cf. [[Skew.contentSalt]]):
    *  - a NULL version sorts LAST (explicit `desc_nulls_last`): a versionless
    *    update can never displace any versioned row, of either side;
    *  - two rows tying on (key, version, side) — intra-batch duplicates —
    *    break the tie by a content hash over ALL columns, so the survivor is
    *    a pure function of row CONTENT, never of partitioning, input order,
    *    or retry history. Rows tying on the hash are byte-equal duplicates,
    *    for which any choice is the same row.
    */
  def keepLatest(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
                 versionCol: String): DataFrame = {
    require(!(base.columns ++ updates.columns).contains("__src"),
      "input schema may not contain the reserved column __src")
    val all = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val contentCols = all.columns.filterNot(_ == "__src").map(col).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc_nulls_last, col("__src").desc,
        xxhash64(contentCols: _*).asc)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** Partition-scoped CDC merge into a `partitionCol`-partitioned parquet
    * table at `basePath`: [[keepLatest]] semantics, but the base scan is
    * PRUNED to the partitions the batch actually touches and ONLY those
    * partition directories are rewritten (dynamic partition overwrite) —
    * every other file on disk stays byte-identical. Merge cost scales with
    * touched-partition volume, not table size: a daily batch against a
    * date-partitioned 100 TB corpus reads and rewrites days, not years.
    *
    * Contract: `partitionCol` must be stable per key (an update may not
    * move a key across partitions — the standard constraint of any
    * partition-local merge; a moved key's old version would survive in its
    * old partition unseen). The touched-partition value set is collected to
    * the driver — bounded by the batch, like every other sidecar here.
    *
    * `validateKeyStability = true` makes contract violations LOUD instead
    * of silently wrong downstream: the batch's key set is anti-checked
    * against the base partitions OUTSIDE the touched set (a narrow
    * key-column scan + semi-join) and any hit throws with sample keys.
    * Opt-in because it reads key columns of the whole un-touched base —
    * exactly the cost the partition-scoped merge exists to avoid; enable
    * it when the partition key's stability is assumed rather than enforced
    * upstream (e.g. bucket-of-natural-key layouts are safe by
    * construction, mutable-attribute partitions are not).
    *
    * The merged result is materialized via `localCheckpoint` before the
    * write: Spark (correctly) refuses to overwrite a path it is
    * concurrently reading, and the checkpoint severs that lineage. The
    * materialized volume IS the rewrite volume, so this costs nothing
    * beyond what the write itself must process.
    */
  def keepLatestPartitioned(spark: SparkSession, basePath: String,
                            updates: DataFrame, keyCols: Seq[String],
                            versionCol: String, partitionCol: String,
                            validateKeyStability: Boolean = false): Unit = {
    val touched = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0))
    if (touched.isEmpty) return // empty batch: nothing to rewrite
    // null-SAFE partition match: a batch row with a null partition value
    // must pull the base's null-partition rows into the merge — a bare
    // isin(null) never matches, so the dynamic overwrite would replace
    // __HIVE_DEFAULT_PARTITION__ with update-only rows and silently drop
    // every base key living there
    val pruned = touched.map {
      case null => col(partitionCol).isNull
      case v    => col(partitionCol) === lit(v)
    }.reduce(_ || _)
    if (validateKeyStability) {
      // a moved key = one of the batch's keys already living in a base
      // partition the batch does NOT touch. coalesce(pruned, false): for a
      // null-partition base row `pruned` evaluates to NULL (unless the
      // batch touches the null partition explicitly), and a bare !NULL
      // would silently exclude that row from the check
      val outside = spark.read.parquet(basePath)
        .where(!coalesce(pruned, lit(false)))
        .select((keyCols :+ partitionCol).map(col): _*)
        .join(updates.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_semi")
      val moved = outside.take(4)
      if (moved.nonEmpty)
        throw new IllegalStateException(
          "keepLatestPartitioned: update batch contains key(s) that " +
            "already exist in base partitions outside the touched set — " +
            "the partition key is not stable for these keys and their old " +
            "versions would survive unseen. Sample (key..., partition): " +
            moved.take(3).map(_.toSeq.mkString("(", ", ", ")"))
              .mkString("; "))
    }
    val base = spark.read.parquet(basePath).where(pruned) // → PartitionFilters
    val merged = keepLatest(base, updates, keyCols, versionCol)
      .localCheckpoint(true)
    // per-WRITE dynamic overwrite (not the session conf): toggling the
    // session value would leak dynamic semantics to concurrent writers on
    // the same SparkSession for the duration of this write
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(basePath)
  }
}
