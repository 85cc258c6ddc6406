package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Keyed upsert (CDC-style merge) for immutable columnar storage: vanilla
  * Spark-on-parquet has no MERGE INTO, so the operator is the classic
  * union + keep-latest-per-key window. One shuffle on the key columns —
  * the minimum for a keyed merge; the window needs no extra exchange
  * because it partitions by the same key.
  *
  * At 100 TB the refinement is partition-scoped merging: restrict `base` to
  * the partitions that actually contain updated keys (a semi-join on the
  * batch's partition values, pruned at the parquet scan) and rewrite only
  * those via dynamic partition overwrite — the merge cost then scales with
  * the touched-partition volume, not the corpus. The keep-latest semantics
  * below are unchanged by that optimization.
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
}
