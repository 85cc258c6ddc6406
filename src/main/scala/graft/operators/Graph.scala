package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph analysis over an edge list — the curation signal family the
  * web-corpus pipelines derive from hyperlink structure (OPIC / PageRank
  * style centrality: CommonCrawl ranks hosts this way, and quality-filter
  * recipes use the score as a keep/drop prior; Page et al. 1999, "The
  * PageRank citation ranking"). The engine-side contract mirrors
  * [[Components]]: the graph is an ordinary DataFrame of (src, dst[, w])
  * rows, every iteration is one equi-join + one grouped sum keyed on node
  * id, and per-round lineage is truncated with `localCheckpoint` so the
  * driver loop stays O(1) in plan size.
  *
  * Scale shape: state is one (id, rank) row per node — the HOST/domain
  * graph of a 100 TB crawl is millions of rows, not billions — while the
  * edge list stays partitioned on `src` across every round, so each
  * iteration re-shuffles only the rank table. Fixed ITERATION COUNT rather
  * than convergence detection keeps the result a pure function of the
  * input (cross-engine reproducible, so the oracle can unroll the same
  * rounds), and avoids a per-round driver round-trip on the changed-count.
  */
object Graph {

  /** PageRank over the directed multigraph `edges` (`srcCol`, `dstCol`
    * castable to long; optional `weightCol` — parallel edges coalesce by
    * summing weights, unweighted edges count 1.0 each). Returns one row per
    * node appearing as src or dst: (id, rank), ranks summing to 1.
    *
    * Per round, with damping d over N nodes:
    *   rank'(v) = (1-d)/N + d·(Σ_{u→v} rank(u)·w(u→v)/outw(u) + dang/N)
    * where `dang` is the total rank parked on dangling nodes (no
    * out-edges) — redistributed uniformly, the standard stochastic-matrix
    * completion, so Σ rank' = 1 exactly (up to float error) every round.
    *
    * The dangling mass and N ride the plan as a 1-row cross join (the
    * [[Sampling.temperatureTake]] scalar-total move) — no per-iteration
    * driver collect; the only driver scalar is the single upfront node
    * count.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: Option[String] = None,
               iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0, 1), got $damping")
    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .groupBy("src", "dst").agg(sum("w").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // the one driver scalar: a single long
    require(n > 0, "pageRank needs at least one edge")
    // transition probability per edge; partitioned on src for every round's
    // rank join
    val trans = e.groupBy("src").agg(sum("w").as("__ow"))
      .join(e, "src")
      .select(col("src"), col("dst"), (col("w") / col("__ow")).as("p"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val srcs = e.select("src").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    var prev: DataFrame = ranks
    for (_ <- 1 to iterations) {
      val dang = ranks.join(srcs, col("id") === col("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0)).as("__dang"))
      val contrib = trans
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .groupBy("dst").agg(sum(col("rank") * col("p")).as("__c"))
      val next = nodes
        .join(contrib, col("id") === col("dst"), "left")
        .crossJoin(dang)
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("__c"), lit(0.0)) + col("__dang") / n))
            .as("rank"))
        .localCheckpoint(true) // truncate per-round lineage growth
      // previous round's blocks are unreachable once `next` materialized
      org.apache.spark.sql.GraftBridge.unpersistCheckpoint(prev)
      prev = next
      ranks = next
    }
    e.unpersist(false); nodes.unpersist(false)
    trans.unpersist(false); srcs.unpersist(false)
    ranks
  }

  /** Degree/strength summary per node of the directed multigraph:
    * (id, out_deg, in_deg, out_w, in_w) — distinct-neighbor degrees and
    * summed edge weights, zero-filled for one-sided nodes. One grouped agg
    * per direction + one full-outer merge, all keyed on node id.
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String,
              weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(col(_).cast("double")).getOrElse(lit(1.0))
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull)
    val out = e.groupBy(col("src").as("id"))
      .agg(count_distinct(col("dst")).as("out_deg"), sum("w").as("out_w"))
    val in = e.groupBy(col("dst").as("id"))
      .agg(count_distinct(col("src")).as("in_deg"), sum("w").as("in_w"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_w"), lit(0.0)).as("out_w"),
        coalesce(col("in_w"), lit(0.0)).as("in_w"))
  }
}
