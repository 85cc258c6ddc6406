package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association mining over (basket, item) co-occurrence — the
  * market-basket / co-occurrence statistics a curation pipeline uses to
  * find correlated sources, tags that travel together, or co-cited
  * documents: for every item pair within a basket, support counts plus
  * lift = P(ab)/(P(a)·P(b)) and PMI = log2(lift). Exact, so the query
  * rows carry full DuckDB oracles.
  *
  * Scale shape: the stream collapses to DISTINCT (basket, item) first
  * (multiplicity inside one basket is presence, not extra support), the
  * pair stream is the basket-keyed self-join with `item_a < item_b` —
  * O(Σ k_b²) rows, the irreducible cost of exact pair support, keyed and
  * grouped on the pair — and the per-item supports plus the basket total
  * fold back as BROADCASTS (vocabulary-bounded and scalar, never a
  * corpus-sized side). `minSupport` prunes the pair tail BEFORE the
  * joins so the broadcast pricing touches only surviving pairs.
  */
object Assoc {

  def pairAssociations(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport=$minSupport")
    val b = df
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .where(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val pairs = b.as("x").join(b.as("y"),
        col("x.basket") === col("y.basket") &&
        col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
      .agg(count(lit(1)).as("support_ab"))
      .where(col("support_ab") >= minSupport)
    val items = b.groupBy(col("item")).agg(count(lit(1)).as("support"))
    val total = b.agg(count_distinct(col("basket")).as("n_baskets"))
    pairs
      .join(broadcast(items.select(col("item").as("item_a"),
        col("support").as("support_a"))), Seq("item_a"))
      .join(broadcast(items.select(col("item").as("item_b"),
        col("support").as("support_b"))), Seq("item_b"))
      .crossJoin(broadcast(total))
      .withColumn("lift",
        col("support_ab").cast("double") * col("n_baskets") /
          (col("support_a") * col("support_b")))
      .withColumn("pmi", log2(col("lift")))
      .select(col("item_a"), col("item_b"), col("support_ab"),
        col("support_a"), col("support_b"), col("n_baskets"),
        col("lift"), col("pmi"))
  }
}
