package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * classic 100 TB failure mode: one hot key lands an entire shuffle
  * partition on one executor).
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins at
  * runtime; explicit salting remains the tool when the skew is known ahead
  * of time, the join is not SMJ, or deterministic partition sizing is
  * required. [[saltedJoin]] scatters the big side across `salts`
  * sub-partitions per key and replicates the (broadcastable-or-not) small
  * side once per salt — same join result, `salts`× smaller max partition.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted.
    *
    * The salt is CONTENT-DERIVED — `pmod(xxhash64(seed, <all big cols>),
    * salts)` — not `rand()`: rand is seeded per partition INDEX, so a
    * stage retry or an AQE re-partition can re-deal salts mid-query.
    * Correctness would survive (every salt joins the replicated small
    * side) but runs would not be bit-reproducible, which this engine
    * guarantees everywhere else. Hashing ALL columns matters: hashing the
    * key alone would map each hot key to ONE salt — zero spread. Exact
    * duplicate rows share a salt by construction; only a hot key whose
    * rows are byte-identical re-concentrates, and that case needs a
    * synthetic row id upstream, not a different hash.
    */
  /** The content-derived salt in [0, salts) for `df`'s rows. */
  def contentSalt(df: DataFrame, salts: Int, seed: Long = 42L): org.apache.spark.sql.Column =
    pmod(xxhash64(lit(seed) +: df.columns.toSeq.map(col): _*), lit(salts.toLong))
      .cast("int")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, seed: Long = 42L): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("__salt", contentSalt(big, salts, seed))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
