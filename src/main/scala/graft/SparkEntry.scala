package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the reference-parity/analytics suite
  * ([[Queries]], one entry per SURVEY.md §2 operator) and the
  * LLM-data-pipeline extensions ([[ExtQueries]]). `oracleSql` carries the
  * DuckDB twin for every SQL-expressible query; hash-based ops
  * (MinHash/SimHash/hyperplane-LSH) are rows-only and verified by ScalaTest.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the TPC-H-Q3-shaped join+agg+top-k (scan, broadcast join, shuffle agg,
    * TakeOrderedAndProject — the spine of the engine, SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_top_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ ExtQueries.oracles

  /** Untimed per-pass setup for queries whose timed body would
    * otherwise include constant fixture staging (scratch-copy rows):
    * [[Bench]] runs `prepares(name)` BEFORE starting its clock; rows
    * absent from this map need no staging. Verify ignores it — those
    * row bodies self-stage when no pristine copy is waiting. */
  def prepares: Map[String, (SparkSession, String) => Unit] =
    ExtQueries.prepares

  /** Headline subset timed by [[Bench]] — the queries whose plans exercise
    * the scale-critical paths (shuffle agg, joins, window, top-k, dedup,
    * ANN) without the O(n²)-by-design pair generators dominating wall time.
    * The first 20 names are FROZEN (round-over-round comparability);
    * `dedup_clean_transitive` was appended in round 7 to time the engine's
    * only iterative-join operator (connectedComponents' per-round
    * localCheckpoint cost — the number that predicts 100× behavior) in its
    * scale composition: MinHash-LSH pairs → components → anti-join.
    * `dedup_components` itself is deliberately NOT here: its pair source is
    * the O(n²)-by-design ngram verify (the oracle anchor), which drowns the
    * iteration being measured — measured at sf0.1: ~7-13 s of quadratic
    * pair verify vs ~1-3 s of iteration.
    */
  def benchQueries: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_revenue", "q5_nation_revenue",
    "q_window_top2", "q_distinct_agg", "o1_sort_desc", "o2_topk",
    "s2_scan_filter", "w1_remaining_time", "e2_clean_salary",
    "q_asof_join", "q_range_join", "q_sessionize", "q_sessionize_native",
    "q_salted_join",
    "dedup_exact", "dedup_minhash", "text_stats", "ann_bruteforce",
    "ann_lsh",
    // r19 rename of the r7 "dedup_clean_transitive" entry: the SAME
    // computation (MinHash-LSH pairs → components → anti-join — the
    // iterative-join composition this slot has always timed) now lives
    // under the _mh key, because dedup_clean_transitive itself flipped
    // to the oracle-checked ngram pair set whose O(n²)-by-design verify
    // would drown the iteration being measured (the dedup_components
    // exclusion rationale below). Values are comparable across the
    // rename round-over-round.
    "dedup_clean_transitive_mh",
    // round 8: the corpus-gate path the builder loop runs every batch —
    // narrow quality gates fused in one scan (no broadcast side here; the
    // decontamination broadcast is timed inside the corpus pipeline specs)
    "corpus_filter_kept",
    // round 9: the widest join tree in the suite (lineitem⋈orders⋈customer
    // ⋈nation, date-filtered before the join, dims broadcast) — the plan
    // most predictive of multi-dimension reporting at scale
    "q10_returned_items",
    // round 9: the two ends of the new spectrum — BM25 retrieval (the
    // tokenize+explode+aggregate text path over documents) and Q6 (the
    // pure-pushdown scan: three pushed predicates, two-column read)
    "q_bm25_topk", "q6_forecast_revenue",
    // round 9: the correlated semi+anti pair on one shuffle (Q21 — the
    // plan that predicts EXISTS-heavy reporting) and the sliding-window
    // corpus rewrite (ExactSubstr removal — the heaviest text-dedup pass).
    // Round 12 swapped the removal row to the keyByHash variant: that is
    // the plan a 100 TB run uses (8-byte window keys in the shuffle, not
    // ~16 tokens of text), so it is the number worth tracking; the textual
    // variant remains the oracle anchor and the _hashed_gap twin pins the
    // two byte-identical every round.
    "q21_sole_blame", "dedup_span_removal_hashed",
    // round 9: the engine's second iterative-join family (5 PageRank
    // rounds over the trade graph built from a 600k-row fact-fact join)
    // and the decode-heavy modality path (5k real PNG decodes → dHash →
    // blocked Hamming join)
    "q_pagerank", "mm_dhash_dedup",
    // round 14: the same dedup served from the hash-once fingerprint
    // index — pass 1 builds the index (decode), passes 2+ join 8-byte
    // hashes with zero decodes, so the min-of-passes number IS the
    // amortized steady-state cost next to mm_dhash_dedup's per-run
    // decode cost
    "mm_dhash_dedup_indexed",
    // round 14: the KMV set-operation sketch — 4 per-batch bottom-k
    // aggregations over orders (the typed-Aggregator ingest path whose
    // throughput is the 100 TB cost) + the O(k) overlap serve
    "q_kmv_overlap",
    // round 15: the monitoring SERVE paths — their design claim is
    // O(#batches) cost independent of corpus size, and these rows put a
    // number on it: the fixtures are built once outside the steady
    // state (marker-gated, the mm_dhash_dedup_indexed convention), so
    // the min-of-passes number is the pure sidecar-merge serve cost
    "q_sketch_sidecar", "q_heavy_hitters",
    // round 15 (cont.): the EXACT moments serve (grouped sidecar,
    // cross-group merge) and the scan-free join-size estimate (two CMS
    // merges + one depth x width driver pass) — both serve-only rows on
    // marker-gated fixtures, same steady-state convention as above
    "q_sketch_moments", "q_join_size",
    // round 16: BM25 served from the persisted inverted index — the
    // lexical-retrieval steady state next to q_bm25_topk's per-query
    // corpus scan (marker-gated fixture: pass 1 ingests, passes 2+ time
    // the pruned-partition serve alone)
    "q_bm25_indexed",
    // round 17: exact-phrase retrieval from the positional index — the
    // same pruned tp= serve plus the position-array adjacency algebra;
    // its cost is corpus-size-independent by construction and this row
    // prices the positional overhead next to q_bm25_indexed
    "q_bm25_phrase",
    // round 18: takedown THROUGHPUT — retractDocs over a pristine
    // artifact copy (corpus + positional text index + MinHash + bloom
    // keys; the copy is bounded and constant). The number tracks the
    // pruned leaf rewrites: an accidental full-index rewrite regression
    // shows up here as wall time, not just in specs
    "q_takedown_apply",
    // round 18: the LAZY verb on the same fixture — its wall time IS
    // the takedown SLA (invisibility latency, O(ids) overlay writes),
    // read against q_takedown_apply's deferred physical pass
    "q_takedown_tombstone",
    // round 19: the two LAYOUT-MAINTENANCE verbs as throughput rows —
    // IVF re-clustering (Lloyd over current contents + whole-root swap;
    // the number an operator weighs against degraded probe latency when
    // ann_index_stats' imbalance drifts) and the z-order rewrite (the
    // OPTIMIZE ZORDER BY cost next to the avg_box_frac decay it buys
    // back). q_zorder_maintain builds its fixture inside the clock by
    // design (the verb IS a rewrite pass, so fixture build + rewrite is
    // the honest unit of work); q_ivf_recluster moved to untimed
    // staging in round 20 — the decayed index and the brute-force
    // recall truth are CONSTANT fixture, not the verb, so prepares
    // stages them (the q_takedown_apply convention) and the row prices
    // recluster + post-swap serve alone
    "q_ivf_recluster", "q_zorder_maintain",
    // round 19 cont.: the PARTIAL z-order rewrite beside the whole-root
    // one — same decay fixture, only the decayed files rewritten
    // (tight files hardlink-carried). The pair of numbers is the
    // incremental-maintenance claim made measurable: partial should
    // track the decayed-tail size, not the table size
    "q_zorder_incremental",
    // round 19: the training-shard export — served read + hash shuffle
    // + packing window + sharded write, the full "ship to the trainer"
    // pass whose wall-clock at 100 TB is a maintenance-window line item
    "q_export_shards",
    // round 19 cont.: the deterministic Poisson bootstrap — prices the
    // R×-inflated narrow scan + two-level aggregate shape (error bars
    // from one pass; the statistical-monitoring cost at scale)
    "q_bootstrap_ci",
    // round 20: the bootstrap QUANTILE — the other aggregate shape the
    // family has (a replicate-partitioned running-weight window over
    // the inflated frame, i.e. R per-replicate sorts), priced next to
    // q_bootstrap_ci's pure two-level aggregate
    "q_bootstrap_quantile")
}
