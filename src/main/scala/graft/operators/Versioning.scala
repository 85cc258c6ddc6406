package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset versioning — the reproducibility contract a training-data
  * pipeline signs with its consumers: a MANIFEST (one content
  * fingerprint per document) pins exactly what a corpus snapshot
  * contained, and a manifest DIFF answers "what changed between the
  * corpus we trained on last month and today's" without shipping either
  * corpus. This is how data changes get code-review-shaped: added /
  * removed / changed doc sets, not terabyte blobs.
  *
  * Fingerprints are `md5(text)` — content-addressed, order-independent,
  * and computed identically by every engine (unlike xxhash64, md5 is a
  * cross-engine standard, which keeps the whole family value-oracled
  * rather than rows-only). The manifest is (id, fingerprint, n_bytes):
  * narrow, sorted nowhere, ~40 bytes a row — a 100 TB corpus's manifest
  * is tens of GB and diffs as one full-outer join on the id, partitioned
  * like any other keyed table.
  */
object Versioning {

  /** The manifest frame: (idCol, fingerprint, n_bytes). */
  def manifest(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    require(!df.columns.exists(Seq("fingerprint", "n_bytes").contains),
      "input already carries a fingerprint/n_bytes column")
    df.select(col(idCol), md5(col(textCol).cast("binary")).as("fingerprint"),
      octet_length(col(textCol)).cast("long").as("n_bytes"))
  }

  /** Diff two manifests by id: one row per id whose status is not
    * `unchanged` — (idCol, status ∈ added|removed|changed, old
    * fingerprint, new fingerprint). `added`/`removed` are from the
    * perspective of `to` (the newer snapshot). One full-outer equi-join
    * on the id; nothing else moves.
    */
  def diff(from: DataFrame, to: DataFrame, idCol: String): DataFrame = {
    val a = from.select(col(idCol), col("fingerprint").as("old_fingerprint"))
    val b = to.select(col(idCol), col("fingerprint").as("new_fingerprint"))
    a.join(b, Seq(idCol), "full")
      .withColumn("status",
        when(col("old_fingerprint").isNull, lit("added"))
          .when(col("new_fingerprint").isNull, lit("removed"))
          .when(col("old_fingerprint") =!= col("new_fingerprint"),
            lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .select(col(idCol), col("status"),
        col("old_fingerprint"), col("new_fingerprint"))
  }

  /** Snapshot-level summary of a diff: one row per status with counts
    * and the byte mass it moved (bytes measured on the side that HAS
    * the doc: `to` for added/changed, `from` for removed).
    */
  def diffSummary(from: DataFrame, to: DataFrame, idCol: String): DataFrame = {
    val d = diff(from, to, idCol)
    val fromBytes = from.select(col(idCol), col("n_bytes").as("__v_fb"))
    val toBytes = to.select(col(idCol), col("n_bytes").as("__v_tb"))
    d.join(fromBytes, Seq(idCol), "left")
      .join(toBytes, Seq(idCol), "left")
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("status") === "removed", col("__v_fb"))
          .otherwise(col("__v_tb"))), lit(0L)).as("n_bytes"))
  }
}
