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

  /** Equi-join `big ⋈ small` on `key`, salted. `seed` makes the salt
    * assignment reproducible run-to-run.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, seed: Long = 42L): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("__salt",
      floor(rand(seed) * salts).cast("int"))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
