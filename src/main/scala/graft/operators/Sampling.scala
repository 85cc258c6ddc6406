package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `sample(fraction)` answers "give me roughly p% of everything"; corpus
  * curation usually needs "give me exactly `quota` documents PER language /
  * source / length bucket, reproducibly" — balanced strata, stable across
  * reruns, auditable by any engine. The pseudo-random order here is a
  * multiplicative-hash scramble of the id (Knuth's 2654435761 mod 2^32):
  * plain integer arithmetic, so the DuckDB oracle runs the SAME expression
  * — unlike `rand()`, which is engine- and partition-seeded.
  *
  * Scale shape: one window over a strata-keyed shuffle; only the per-row
  * rank is materialized. Skewed strata are bounded by the quota itself (the
  * window emits at most `quota` survivors per stratum after the filter).
  */
object Sampling {

  /** The scrambled sort key: uncorrelated with id order, identical in any
    * engine that has 64-bit integer arithmetic.
    */
  def scramble(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L))

  /** Deterministic train/validation/test assignment by scrambled id — the
    * reproducible split every training pipeline needs: no `rand()` (engine-
    * and partition-seeded, unauditable), just the same multiplicative
    * scramble as every sampler here, so ANY engine recomputes identical
    * membership and a document can never migrate between splits across
    * reruns or cluster layouts. `splits` maps label → weight (normalized
    * over their sum); thresholds are integer cuts of the 2^32 scramble
    * domain, so expected proportions hold to ±2^-32. Pure per-row
    * arithmetic — no shuffle, no state, appends a `split` column.
    */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)],
                splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    require(splits.map(_._1).distinct.size == splits.size,
      "duplicate split labels")
    require(!df.columns.contains(splitCol), s"column $splitCol exists")
    val thresholds = splitThresholds(splits.map(_._2))
    val h = scramble(col(idCol))
    val assigned = splits.map(_._1).zip(thresholds).init
      .foldRight(lit(splits.last._1): Column) {
        case ((label, thr), acc) => when(h < thr, lit(label)).otherwise(acc)
      }
    df.withColumn(splitCol, assigned)
  }

  /** Cumulative integer thresholds over the 2^32 scramble domain — shared
    * with the generated SQL twin so both engines cut at identical points.
    */
  def splitThresholds(weights: Seq[Double]): Seq[Long] = {
    val total = weights.sum
    weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c / total * 4294967296.0))
  }

  /** Priority sampling (Duffield, Lund & Thorup, JACM 2007): a FIXED-k
    * weighted sample from which ANY subset sum is estimable — the
    * bounded-size answer store for "total tokens of domain D / spend of
    * segment S" questions a 100 TB table can't afford per query. Each
    * row gets priority q = w/u with u ∈ (0, 1] DETERMINISTIC from the
    * id ([[scramble]] — no engine-seeded rand(), so the sample is
    * reproducible anywhere, and the whole selection carries a full SQL
    * oracle); the k highest-priority rows survive, and τ = the
    * (k+1)-th priority prices each survivor at its Horvitz–Thompson
    * weight max(w, τ). Estimating Σ_{i∈S} w_i = summing `ht_weight`
    * over the sample's rows in S — unbiased over the u-draws, with
    * variance ≤ W²/(k−1) for the total (Szegedy's proof of the
    * Duffield–Lund–Thorup optimality conjecture, STOC'06).
    *
    * Scale shape: one TakeOrderedAndProject (top k+1 by priority — no
    * full sort), a row_number over the ≤ k+1 survivors (bounded, single
    * partition by construction), τ folded back as a broadcast scalar —
    * no driver collect in the plan. Rows with null or ≤ 0 weight have
    * no defined priority and are excluded (match the oracle with
    * `WHERE w > 0`). When the table has ≤ k qualifying rows, τ = 0 and
    * every ht_weight is the exact weight.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val u = (scramble(col(idCol)) + 1) / lit(4294967296.0)
    val take = df
      .where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__q", col(weightCol).cast("double") / u)
      .orderBy(col("__q").desc, col(idCol))
      .limit(k + 1)
    val w = Window.orderBy(col("__q").desc, col(idCol))
    // tau rides a whole-frame window over the SAME ≤ k+1 survivors the
    // rank window already holds (single partition by construction), so
    // the expensive part — the TakeOrdered scan of the source — runs
    // exactly once; a separate aggregate branch would execute it twice
    val wAll = Window
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    take.withColumn("__rn", row_number().over(w))
      .withColumn("__tau", coalesce(
        max(when(col("__rn") === k + 1, col("__q"))).over(wAll), lit(0.0)))
      .where(col("__rn") <= k)
      .withColumn("ht_weight",
        greatest(col(weightCol).cast("double"), col("__tau")))
      .drop("__q", "__rn", "__tau")
  }

  /** [[prioritySample]] PER STRATUM: a fixed-k weighted sample of EVERY
    * group in one pass — the per-domain/per-language subset-sum store
    * ("spend of segment S within domain D" from k·#domains rows). Each
    * stratum gets its own threshold τ_g = its (k+1)-th priority, so the
    * per-group estimator guarantees are [[prioritySample]]'s verbatim
    * on each group's own mass. One shuffle on the stratum (the window),
    * rank + τ computed inside the same window pass — no per-group
    * driver work, no TakeOrdered (the window's per-partition top-k is
    * the scalable shape when #groups × k rows is the output, vs one
    * global limit). Same determinism and exclusions as
    * [[prioritySample]]; same full-SQL-oracle property.
    */
  def prioritySamplePerStratum(df: DataFrame, strataCols: Seq[String],
                               idCol: String, weightCol: String,
                               k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    require(strataCols.nonEmpty)
    val u = (scramble(col(idCol)) + 1) / lit(4294967296.0)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("__q").desc, col(idCol))
    val wAll = Window.partitionBy(strataCols.map(col): _*)
    val ranked = df
      .where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__q", col(weightCol).cast("double") / u)
      .withColumn("__rn", row_number().over(w))
      // rows beyond k+1 are dead weight for both the sample and tau —
      // drop them before the tau window pass
      .where(col("__rn") <= k + 1)
      .withColumn("__tau", coalesce(
        max(when(col("__rn") === k + 1, col("__q"))).over(wAll), lit(0.0)))
    ranked.where(col("__rn") <= k)
      .withColumn("ht_weight",
        greatest(col(weightCol).cast("double"), col("__tau")))
      .drop("__q", "__rn", "__tau")
  }

  /** Keep `quota(row)` rows per stratum, chosen by scrambled-id order
    * (ties on the raw id for total determinism). `quota` is any Column —
    * a literal for balanced strata, or an expression over the stratum
    * columns for weighted mixtures.
    */
  def takePerStratum(df: DataFrame, strataCols: Seq[String], idCol: String,
                     quota: Column): DataFrame = {
    require(strataCols.nonEmpty)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(scramble(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Keep `quota` rows per stratum — the balanced special case. */
  def stratifiedTake(df: DataFrame, strataCols: Seq[String], idCol: String,
                     quota: Int): DataFrame = {
    require(quota > 0)
    takePerStratum(df, strataCols, idCol, lit(quota))
  }

  /** Domain mixing: per-stratum quotas from an explicit weight table (the
    * Pile/Llama-style mixture spec — "this many documents from each
    * source"). Strata absent from the map get `default` (0 = drop).
    *
    * Plan shape follows the map size. A config-sized map (≤
    * `broadcastThreshold` entries) inlines as a literal `when` chain — no
    * join, the plan stays one window over the strata shuffle. A large
    * mixture spec (thousands of domains) would make that an O(|map|)-deep
    * expression tree — Catalyst analysis cost and codegen method-size
    * limits — so above the threshold the quotas become a BROADCAST quota
    * table left-joined on the stratum key instead: one extra broadcast of
    * config-sized data, same single window, identical row semantics.
    */
  /** Temperature-scaled domain mixing — the Pile/LLaMA mixture math:
    * stratum i receives quota ∝ nᵢ^alpha of the `budget`, alpha = 1/T
    * (alpha 1 = proportional to natural frequency, alpha → 0 = uniform;
    * 0.5–0.7 is the usual up-weighting of small high-quality sources).
    * Unlike [[weightedTake]]'s explicit map, the quotas here are COMPUTED
    * FROM THE DATA: one grouped count (sublinear output), one scalar
    * total, a broadcast quota join — no driver-side collect, so a
    * million-stratum corpus plans the same shape. Quotas floor, so
    * strata too small for one slot drop (standard mixture behavior);
    * rank order within a stratum is the same deterministic scramble as
    * every other sampler here.
    */
  def temperatureTake(df: DataFrame, strataCol: String, idCol: String,
                      alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha = 1/T must be in (0, 1]")
    require(budget > 0)
    require(!df.columns.exists(_.startsWith("__tt_")),
      "input already carries __tt_-prefixed internals")
    val weights = df.groupBy(strataCol)
      .agg(count(lit(1)).as("__tt_n"))
      .withColumn("__tt_w", pow(col("__tt_n"), alpha))
    val total = weights.agg(sum("__tt_w").as("__tt_total"))
    val quotas = weights.crossJoin(total)
      .select(col(strataCol).as("__tt_key"),
        floor(lit(budget.toDouble) * col("__tt_w") / col("__tt_total"))
          .cast("int").as("__tt_quota"))
    // null-SAFE quota join: groupBy above counts a NULL stratum like any
    // other, so it owns a quota row — a bare equi-join would never match
    // it back and silently drop every null-stratum row from the mixture
    takePerStratum(
        df.join(broadcast(quotas), col(strataCol) <=> col("__tt_key")),
        Seq(strataCol), idCol, col("__tt_quota"))
      .drop("__tt_key", "__tt_quota")
  }

  def weightedTake(df: DataFrame, strataCol: String, idCol: String,
                   quotas: Map[String, Int], default: Int = 0,
                   broadcastThreshold: Int = 100): DataFrame = {
    if (quotas.size <= broadcastThreshold) {
      val quota = quotas.foldLeft(lit(default)) { case (acc, (k, v)) =>
        when(col(strataCol) === k, lit(v)).otherwise(acc)
      }
      takePerStratum(df, Seq(strataCol), idCol, quota)
    } else {
      require(!df.columns.exists(_.startsWith("__wt_")),
        "input already carries __wt_-prefixed internals")
      val spark = df.sparkSession
      import spark.implicits._
      val qdf = quotas.toSeq.toDF("__wt_key", "__wt_quota")
      takePerStratum(
          df.join(broadcast(qdf), col(strataCol) === col("__wt_key"), "left"),
          Seq(strataCol), idCol,
          coalesce(col("__wt_quota"), lit(default)))
        .drop("__wt_key", "__wt_quota")
    }
  }

  /** Nucleus (top-p) curation by MASS, not count: per stratum, keep the
    * best-scoring rows until they cover `pNum/pDen` of the stratum's total
    * `massCol` — "the top documents carrying 80% of the character mass per
    * source". The count-quota samplers above answer "N rows per stratum";
    * this answers "the head of the quality distribution, however many rows
    * that is" — the top-p idea applied to data curation, where mass is
    * tokens/chars and score is a quality signal.
    *
    * A row survives while its INCLUSIVE running mass (score-descending,
    * `idCol` tie-break) satisfies `cum · pDen ≤ total · pNum` — pure
    * 64-bit integer arithmetic when `massCol` is integral, so the cut is
    * bit-stable in any engine (the fraction is never materialized as a
    * float). Note the boundary convention: the first row whose inclusive
    * mass crosses p is DROPPED, so strata whose single best row exceeds p
    * emit nothing — callers wanting ≥1 row per stratum union a rank-1
    * floor on top.
    *
    * Plan: two windows over the SAME stratum-keyed shuffle (running sum +
    * total) — one exchange, no join, no driver state; million-stratum
    * safe.
    */
  def topMassPerStratum(df: DataFrame, strataCol: String, idCol: String,
                        scoreCol: String, massCol: String,
                        pNum: Long, pDen: Long): DataFrame = {
    require(pNum >= 0 && pDen > 0, s"need 0 <= pNum, 0 < pDen; got $pNum/$pDen")
    val run = Window.partitionBy(strataCol)
      .orderBy(col(scoreCol).desc, col(idCol))
    val all = Window.partitionBy(strataCol)
    df.withColumn("__nm_cum", sum(col(massCol)).over(run))
      .withColumn("__nm_tot", sum(col(massCol)).over(all))
      .where(col("__nm_cum") * pDen <= col("__nm_tot") * pNum)
      .drop("__nm_cum", "__nm_tot")
  }

  /** Cluster-balanced (diversity) selection: per Voronoi cell of the
    * frozen IVF index at `indexPath`, keep the top `quotaPerCell` rows
    * by `scoreCol` (id tie-break) — the diversity-selection staple of
    * training-data curation. A GLOBAL top-N by score lets one dense
    * mode of embedding space dominate the whole selection (near-dup
    * boilerplate scores uniformly well); the per-cell quota spends the
    * same budget across the space, so the selection's cell coverage is
    * never worse than the global cut's (the `q_cluster_sample_gap` twin
    * enforces exactly that).
    *
    * Plan shape: cell assignment is the same narrow in-row argmax every
    * IVF write uses (centroids are literals — no join), then ONE window
    * over a cell-keyed shuffle cuts the quota inside each partition —
    * one exchange total, no driver state beyond the nlist centroid
    * sidecar. Output = the selected rows plus their `cell`.
    */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
                            indexPath: String, quotaPerCell: Int,
                            scoreCol: String): DataFrame = {
    require(quotaPerCell >= 1, s"quotaPerCell=$quotaPerCell")
    // loud, not silent: a frame read back from an IVF data directory
    // already carries a `cell` partition column — overwriting it against
    // a different index would quietly destroy the original assignment.
    // Case-insensitive to match Spark's default resolver (withColumn
    // would replace a `Cell` column too).
    require(!df.columns.exists(_.equalsIgnoreCase("cell")),
      "input already has a 'cell' column — drop or rename it first")
    val cents = Similarity.readCentroids(df.sparkSession, indexPath)
    val celled = df.withColumn("cell", Similarity.bestCellFor(cents)(
      graft.functions.Vectors.toDouble(col(vecCol))))
    val w = Window.partitionBy("cell")
      .orderBy(col(scoreCol).desc, col(idCol))
    celled.withColumn("__cb_rn", row_number().over(w))
      .where(col("__cb_rn") <= quotaPerCell)
      .drop("__cb_rn")
  }

  /** Poisson(1) CDF, cumulative — the inverse-transform table for
    * [[poissonBootstrap]]'s per-(row, replicate) draw counts. Shared
    * verbatim with the DuckDB twin: identical decimal literals parse to
    * identical doubles, so both engines draw identical counts.
    */
  private[graft] val poisson1Cdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402)

  /** DETERMINISTIC Poisson bootstrap — error bars for a mean at 100 TB.
    *
    * The classic bootstrap resamples n rows WITH replacement R times: R
    * full shuffles of the dataset, untenable at scale. The Poisson
    * bootstrap replaces each replicate's multinomial row counts with
    * independent Poisson(1) draws — for large n the replicate
    * distributions converge, and each row's R counts are computable
    * IN-ROW from the row itself: one narrow scan, no resampling shuffle,
    * R× inflation of a two-column projection only, then an R-group
    * aggregate. This is the industry-scale bootstrap (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", Google 2012).
    *
    * Every draw is DETERMINISTIC: u = hash(id, r) / 2³², k =
    * inverse-CDF via [[poisson1Cdf]], so any engine replays the exact
    * counts (the `q_bootstrap_ci` DuckDB twin recomputes the CI
    * bit-for-bit, which no rand()-seeded bootstrap allows), and
    * reruns/retries/AQE re-partitions cannot move the interval.
    *
    * The hash is NOT the house [[scramble]] alone: a bare multiplicative
    * congruence is LINEAR in id, so across consecutive ids the uniforms
    * form an additive low-discrepancy sequence (u, u+α, u+2α, … mod 1) —
    * perfectly stratified draws whose per-replicate counts are strongly
    * anti-correlated, which UNDERDISPERSES the bootstrap (measured ~6×
    * too-narrow intervals — worse than useless for error bars; marginal
    * uniformity, which is all the ranking samplers above need, says
    * nothing about independence ACROSS rows). Two murmur-style
    * finalizer rounds (xor-shift + multiply mod 2³²) break the
    * linearity; the replicate-mean spread then matches a true-RNG
    * Poisson bootstrap within ~8% (1024-replicate calibration). With ids
    * in [0, 2³¹) — checked loudly up front, the
    * [[graft.operators.Retraction.exportTrainingShards]] contract: a
    * negative id makes pmod and C-style `%` diverge, a larger one
    * overflows differently across engines — every intermediate stays
    * below 2⁶³ (max h1 pre-mod ≈ 5.7e18, max h2·1540483477 ≈ 6.6e18),
    * safe under ANSI overflow checking, and every step is plain integer
    * arithmetic DuckDB replays verbatim.
    *
    * Numeric discipline for the cross-engine contract: DECIMAL(18,2)
    * values are summed exactly (as long cents — see [[cents]]; exact
    * and order-independent, where a double sum differs across partition
    * orders in the last bits, which an exact-repr oracle compare would
    * flag), divided once as double, rounded to 6dp BEFORE the quantile
    * interpolation.
    *
    * Returns one row per group (one total for the ungrouped form; EMPTY
    * input → zero rows, matching the SQL twin): (replicates, n_rows,
    * point_mean, ci_lo, ci_median, ci_hi) — the 95% percentile interval
    * over replicate means. Cost: the id-bounds guard is one
    * column-pruned agg; the estimate itself is ONE R×-inflated scan of
    * the (group, id, value) projection — the point estimate rides the
    * same pass (per-(group, replicate) partials carry the base sum and
    * count, identical for every replicate).
    */
  def poissonBootstrap(df: DataFrame, idCol: String, valueCol: String,
                       replicates: Int = 64, seed: Long = 40503L)
      : DataFrame =
    bootstrapCore(df, Nil, idCol, valueCol, replicates, seed)

  /** [[poissonBootstrap]] per group — one CI per domain/stratum from the
    * SAME single scan (the per-domain twin every mixture monitor wants:
    * "did domain X's mean move outside its error bars?"). Group keys
    * ride the replicate aggregate; draws still depend on (id, replicate)
    * only, so a row's counts are identical whether bootstrapped globally
    * or within its group.
    */
  def poissonBootstrapByGroup(df: DataFrame, groupCols: Seq[String],
                              idCol: String, valueCol: String,
                              replicates: Int = 64, seed: Long = 40503L)
      : DataFrame = {
    require(groupCols.nonEmpty, "use poissonBootstrap for no groups")
    bootstrapCore(df, groupCols, idCol, valueCol, replicates, seed)
  }

  /** Bootstrap CI on the DIFFERENCE of two cohort means — the A/B
    * question ("did the treatment move the metric, outside noise?") at
    * 100 TB: per replicate, mean(A) − mean(B) with both cohorts drawn
    * under the same (id, replicate) counts, then the percentile
    * interval. An interval excluding 0 is the deterministic,
    * any-engine-replayable significance call (`q_bootstrap_diff`'s
    * DuckDB twin reproduces it bit-for-bit). Same hash/decimal/rounding
    * discipline and id contract as [[poissonBootstrap]]; one inflated
    * scan, replicates where a cohort drew zero mass yield a null
    * difference that both engines' quantile aggregates skip.
    *
    * Returns one row: (replicates, n_a, n_b, point_diff, ci_lo,
    * ci_median, ci_hi); zero rows on empty input.
    */
  def poissonBootstrapDiff(df: DataFrame, cohortCol: String,
                           cohortA: String, cohortB: String,
                           idCol: String, valueCol: String,
                           replicates: Int = 64, seed: Long = 40503L)
      : DataFrame = {
    require(replicates >= 4, s"replicates=$replicates")
    require(cohortA != cohortB, "cohorts must differ")
    val reserved = Seq("__id", "__v", "__c", "__r", "__u", "__k", "__m",
      "__na", "__nb", "__sa", "__sb")
    Seq(cohortCol, idCol, valueCol).foreach(c =>
      require(!reserved.contains(c), s"column name $c is reserved"))
    val base = df
      .where(col(cohortCol).isin(cohortA, cohortB))
      .select(col(cohortCol).cast("string").as("__c"),
        col(idCol).cast("long").as("__id"),
        cents(col(valueCol).cast("decimal(18,2)")).as("__v"))
    requireBootstrapIds(base, "poissonBootstrapDiff")
    def side(c: String, e: Column): Column = sum(when(col("__c") === c, e))
    // cohort row counts as count(when(...)) — 0 when a cohort is entirely
    // absent, matching the twin's COUNT(CASE ...); sum(when(..., 1)) would
    // emit NULL there and diverge from the oracle
    def nside(c: String): Column = count(when(col("__c") === c, lit(1)))
    val means = withPoissonDraws(base, replicates, seed)
      .groupBy("__r")
      .agg(round(
          centsToDouble(side(cohortA, col("__k") * col("__v"))) /
            when(side(cohortA, col("__k")) =!= 0,
              side(cohortA, col("__k"))) -
          centsToDouble(side(cohortB, col("__k") * col("__v"))) /
            when(side(cohortB, col("__k")) =!= 0,
              side(cohortB, col("__k"))), 6).as("__m"),
        nside(cohortA).as("__na"), nside(cohortB).as("__nb"),
        side(cohortA, col("__v")).as("__sa"),
        side(cohortB, col("__v")).as("__sb"))
    means.agg(
        round(expr("percentile(__m, 0.025)"), 6).as("ci_lo"),
        round(expr("percentile(__m, 0.5)"), 6).as("ci_median"),
        round(expr("percentile(__m, 0.975)"), 6).as("ci_hi"),
        first("__na").as("n_a"), first("__nb").as("n_b"),
        round(centsToDouble(first("__sa")) / first("__na") -
          centsToDouble(first("__sb")) / first("__nb"), 6)
          .as("point_diff"))
      .where(col("n_a").isNotNull || col("n_b").isNotNull)
      .select(lit(replicates).as("replicates"), col("n_a"), col("n_b"),
        col("point_diff"), col("ci_lo"), col("ci_median"), col("ci_hi"))
  }

  /** Bootstrap CI on a QUANTILE — the next question a mixture monitor
    * asks after the mean ("did p50 doc length move?"), from the same
    * draw machinery as [[poissonBootstrap]]: per replicate, the
    * WEIGHTED discrete quantile of the values under the replicate's
    * Poisson counts, then the percentile interval over the replicate
    * quantiles. The per-replicate quantile is deliberately TYPE-1
    * (discrete: the smallest value whose cumulative weight reaches
    * `qNum/qDen` of the replicate's total) — the cut is pure integer
    * arithmetic over exact DECIMAL values, bit-stable in any engine,
    * where an interpolated quantile would put a float formula between
    * the data and the oracle; it is also what a weighted resample
    * means (a row drawn k times is k copies — there is nothing between
    * copies to interpolate). The point estimate is the same discrete
    * quantile of the base data (weight 1), riding the SAME inflated
    * frame as a sentinel replicate — one scan for everything.
    *
    * Scale shape (two-pass exact selection): the naive form — sort the
    * whole (replicates+1)×-inflated frame once per replicate for a
    * running-weight window — pays R near-full sorts and caps
    * parallelism at R window partitions (65 single-task sorts at
    * 100 TB). Instead, pass 1 HASH-AGGREGATES the inflated frame to
    * per-(replicate, value-bucket) weight sums (map-side partials — the
    * inflated rows never cross the shuffle) and a tiny window over the
    * ≤ R×256 bucket rows finds, per replicate, the one bucket whose
    * cumulative weight crosses `qNum/qDen` plus the exact cumulative
    * prefix before it; pass 2 re-derives the (deterministic) draws for
    * ONLY the rows of each replicate's target bucket (a broadcast join
    * against the bucket map) and runs the exact running-weight cut
    * there — ~1/256 of the data through the only sort in the plan. The
    * cut itself is unchanged: the smallest value whose cumulative
    * weight reaches the target, bit-identical to the single-window
    * form and to the DuckDB twin (which replays the one-window
    * definition). Same hash/decimal discipline and [0, 2³¹) id
    * contract as every bootstrap verb here; replicates that drew zero
    * total mass are skipped (both engines alike).
    *
    * Returns one row: (replicates, n_rows, point_q, ci_lo, ci_median,
    * ci_hi); zero rows on empty input.
    */
  def poissonBootstrapQuantile(df: DataFrame, idCol: String,
                               valueCol: String, qNum: Long, qDen: Long,
                               replicates: Int = 64, seed: Long = 40503L)
      : DataFrame =
    quantileCore(df, Nil, idCol, valueCol, qNum, qDen, replicates, seed)

  /** [[poissonBootstrapQuantile]] per group — one quantile CI per
    * domain/stratum from the same single inflated scan (the
    * per-domain p50 drift question a mixture monitor asks). Group keys
    * ride the window partition and the replicate aggregate; draws
    * still depend on (id, replicate) only, so a row's counts are
    * identical whether bootstrapped globally or within its group.
    */
  def poissonBootstrapQuantileByGroup(df: DataFrame,
                                      groupCols: Seq[String],
                                      idCol: String, valueCol: String,
                                      qNum: Long, qDen: Long,
                                      replicates: Int = 64,
                                      seed: Long = 40503L): DataFrame = {
    require(groupCols.nonEmpty,
      "use poissonBootstrapQuantile for no groups")
    quantileCore(df, groupCols, idCol, valueCol, qNum, qDen, replicates,
      seed)
  }

  /** Bootstrap CI on the DIFFERENCE of two cohort QUANTILES — the A/B
    * question asked of the distribution's middle instead of its mean
    * ("did the treatment move p50, outside noise?"): per replicate,
    * each cohort's weighted type-1 quantile under the shared
    * (id, replicate) draws, the difference rounded once, then the
    * percentile interval. A mean difference ([[poissonBootstrapDiff]])
    * is blind to exactly the interventions that move the middle while
    * heavy tails pin the mean. Same integer-exact cut, sentinel
    * point-estimate replicate, decimal/rounding discipline and id
    * contract as [[poissonBootstrapQuantile]]; a replicate where a
    * cohort drew zero mass yields a null difference both engines'
    * quantile aggregates skip.
    *
    * Returns one row: (replicates, n_a, n_b, point_diff, ci_lo,
    * ci_median, ci_hi) — cohort counts 0 when a cohort is entirely
    * absent (the COUNT(CASE) convention); zero rows on empty input.
    */
  def poissonBootstrapQuantileDiff(df: DataFrame, cohortCol: String,
                                   cohortA: String, cohortB: String,
                                   idCol: String, valueCol: String,
                                   qNum: Long, qDen: Long,
                                   replicates: Int = 64,
                                   seed: Long = 40503L): DataFrame = {
    require(replicates >= 4, s"replicates=$replicates")
    require(cohortA != cohortB, "cohorts must differ")
    require(qNum >= 1 && qDen > 0 && qNum <= qDen,
      s"need 1 <= qNum <= qDen, got $qNum/$qDen")
    val reserved = Seq("__id", "__v", "__c", "__r", "__u", "__k",
      "__cum", "__tot", "__q", "__t", "__qa", "__qb", "__ta", "__tb",
      "__m", "__b", "__w", "__wcum", "__pre")
    Seq(cohortCol, idCol, valueCol).foreach(c =>
      require(!reserved.contains(c), s"column name $c is reserved"))
    val base = df
      .where(col(cohortCol).isin(cohortA, cohortB))
      .select(col(cohortCol).cast("string").as("__c"),
        col(idCol).cast("long").as("__id"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
    val qv = quantileCuts(base, Seq("__c"), qNum, qDen, replicates, seed,
      "poissonBootstrapQuantileDiff")
    val byR = qv.groupBy("__r")
      .agg(max(when(col("__c") === cohortA, col("__q"))).as("__qa"),
        max(when(col("__c") === cohortB, col("__q"))).as("__qb"),
        max(when(col("__c") === cohortA, col("__t"))).as("__ta"),
        max(when(col("__c") === cohortB, col("__t"))).as("__tb"))
      .withColumn("__m", round(col("__qa").cast("double") -
        col("__qb").cast("double"), 6))
    byR.agg(
        round(expr("percentile(CASE WHEN __r >= 0 THEN __m END, 0.025)"),
          6).as("ci_lo"),
        round(expr("percentile(CASE WHEN __r >= 0 THEN __m END, 0.5)"),
          6).as("ci_median"),
        round(expr("percentile(CASE WHEN __r >= 0 THEN __m END, 0.975)"),
          6).as("ci_hi"),
        max(when(col("__r") === -1, col("__m"))).as("point_diff"),
        max(when(col("__r") === -1, coalesce(col("__ta"), lit(0L))))
          .as("n_a"),
        max(when(col("__r") === -1, coalesce(col("__tb"), lit(0L))))
          .as("n_b"))
      .where(col("n_a").isNotNull || col("n_b").isNotNull)
      .select(lit(replicates).as("replicates"), col("n_a"), col("n_b"),
        col("point_diff"), col("ci_lo"), col("ci_median"), col("ci_hi"))
  }

  private def quantileCore(df: DataFrame, groupCols: Seq[String],
                           idCol: String, valueCol: String,
                           qNum: Long, qDen: Long,
                           replicates: Int, seed: Long): DataFrame = {
    require(replicates >= 4, s"replicates=$replicates")
    require(qNum >= 1 && qDen > 0 && qNum <= qDen,
      s"need 1 <= qNum <= qDen, got $qNum/$qDen (qNum = 0 would make " +
        "zero-weight rows eligible)")
    val reserved = Seq("__id", "__v", "__r", "__u", "__k", "__cum",
      "__tot", "__q", "__t", "__b", "__w", "__wcum", "__pre")
    (groupCols ++ Seq(idCol, valueCol)).foreach(c =>
      require(!reserved.contains(c), s"column name $c is reserved"))
    val base = df.select(groupCols.map(col) ++ Seq(
      col(idCol).cast("long").as("__id"),
      col(valueCol).cast("decimal(18,2)").as("__v")): _*)
    val qv = quantileCuts(base, groupCols, qNum, qDen, replicates, seed,
      "poissonBootstrapQuantile")
    // ONE aggregation over qv carries both the CI (real replicates)
    // and the sentinel's point estimate as conditional aggregates — a
    // separate point-estimate branch would duplicate the whole
    // two-pass subtree over the inflated frame in the plan,
    // doubling the verb's dominant cost
    val aggs = Seq(
      round(expr("percentile(CASE WHEN __r >= 0 THEN " +
        "CAST(__q AS DOUBLE) END, 0.025)"), 6).as("ci_lo"),
      round(expr("percentile(CASE WHEN __r >= 0 THEN " +
        "CAST(__q AS DOUBLE) END, 0.5)"), 6).as("ci_median"),
      round(expr("percentile(CASE WHEN __r >= 0 THEN " +
        "CAST(__q AS DOUBLE) END, 0.975)"), 6).as("ci_hi"),
      round(max(when(col("__r") === -1, col("__q").cast("double"))), 6)
        .as("point_q"),
      max(when(col("__r") === -1, col("__t"))).as("n_rows"))
    val out =
      if (groupCols.isEmpty) qv.agg(aggs.head, aggs.tail: _*)
      else qv.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val outCols = groupCols.map(col) ++ Seq(
      lit(replicates).as("replicates"), col("n_rows"),
      col("point_q"), col("ci_lo"), col("ci_median"), col("ci_hi"))
    out.where(col("ci_median").isNotNull && col("n_rows").isNotNull)
      .select(outCols: _*)
  }

  /** Bootstrap CI on a RATIO OF SUMS — Σnum/Σden per replicate under
    * the shared (id, replicate) counts: the per-unit metric family
    * ("revenue per item", "tokens per document") where bootstrapping
    * the row-wise quotient would weight every row equally and answer a
    * different question. Same one-inflated-scan shape, decimal sums,
    * single rounding and percentile interval as [[poissonBootstrap]];
    * replicates whose denominator drew zero mass yield a null ratio
    * both engines' quantile aggregates skip.
    *
    * Returns one row: (replicates, n_rows, point_ratio, ci_lo,
    * ci_median, ci_hi); zero rows on empty input.
    */
  def poissonBootstrapRatio(df: DataFrame, idCol: String,
                            numCol: String, denCol: String,
                            replicates: Int = 64, seed: Long = 40503L)
      : DataFrame = {
    require(replicates >= 4, s"replicates=$replicates")
    val reserved = Seq("__id", "__v", "__v2", "__r", "__u", "__k", "__m",
      "__sn", "__sd", "__n")
    Seq(idCol, numCol, denCol).foreach(c =>
      require(!reserved.contains(c), s"column name $c is reserved"))
    val base = df.select(col(idCol).cast("long").as("__id"),
      cents(col(numCol).cast("decimal(18,2)")).as("__v"),
      cents(col(denCol).cast("decimal(18,2)")).as("__v2"))
    requireBootstrapIds(base, "poissonBootstrapRatio")
    val means = withPoissonDraws(base, replicates, seed)
      .groupBy("__r")
      .agg(round(centsToDouble(sum(col("__k") * col("__v"))) /
          centsToDouble(when(sum(col("__k") * col("__v2")) =!= 0,
            sum(col("__k") * col("__v2")))), 6).as("__m"),
        sum("__v").as("__sn"), sum("__v2").as("__sd"),
        count(lit(1)).as("__n"))
    means.agg(
        round(expr("percentile(__m, 0.025)"), 6).as("ci_lo"),
        round(expr("percentile(__m, 0.5)"), 6).as("ci_median"),
        round(expr("percentile(__m, 0.975)"), 6).as("ci_hi"),
        first("__n").as("n_rows"),
        round(centsToDouble(first("__sn")) /
          centsToDouble(when(first("__sd") =!= 0, first("__sd"))), 6)
          .as("point_ratio"))
      .where(col("n_rows").isNotNull)
      .select(lit(replicates).as("replicates"), col("n_rows"),
        col("point_ratio"), col("ci_lo"), col("ci_median"), col("ci_hi"))
  }

  /** Per-(partCols, replicate) weighted TYPE-1 quantile cuts over the
    * deterministic Poisson draws — the shared engine behind
    * [[poissonBootstrapQuantile]], its grouped twin and the A/B diff.
    * `base` must carry `__id` (long) and `__v` (decimal(18,2)) plus
    * `partCols`; returns one row per (partCols, __r) with positive
    * drawn mass: (__q = the cut value, __t = the replicate's total
    * weight), the sentinel replicate −1 (base data, weight 1) included.
    *
    * Two-pass exact selection (the 100 TB shape — see
    * [[poissonBootstrapQuantile]]'s scaladoc):
    *
    *  1. the inflated frame hash-aggregates to per-(part, __r, bucket)
    *     weight sums — map-side partials, so the inflated rows never
    *     cross a shuffle; buckets are ≤ 256 equal-width slices of the
    *     value domain (bounds from the same one-row agg as the id
    *     guard), a monotone function of `__v`, nulls first (bucket −1,
    *     Spark's ASC NULLS FIRST). A window over the tiny bucket frame
    *     finds per (part, __r) the FIRST bucket whose cumulative weight
    *     reaches `qNum/qDen` of the total — the cut provably lands
    *     inside it (its cumulative crosses the target there) — plus the
    *     exact cumulative prefix before it and the total.
    *  2. only that bucket's rows join back (broadcast of the one-row-
    *     per-replicate bucket map), the draws re-derive — they are pure
    *     (id, replicate) arithmetic, so re-deriving is cheaper than
    *     carrying them through a shuffle — and the exact running-weight
    *     cut runs inside the bucket, seeded with the pass-1 prefix:
    *     the only sort in the plan sees ~1/256 of the inflated frame.
    *
    * The qualifying suffix starts at the first row whose cumulative
    * weight reaches the target (cum only crosses it where k > 0, so
    * min(v) lands on a drawn row; zero-total replicates are skipped) —
    * the same cut, bit-for-bit, as a single running-weight window over
    * the full inflated frame, which is what the DuckDB twins replay.
    */
  private def quantileCuts(base: DataFrame, partCols: Seq[String],
                           qNum: Long, qDen: Long, replicates: Int,
                           seed: Long, verb: String): DataFrame = {
    // id guard + histogram domain in ONE column-pruned one-row agg
    val bounds = base.agg(min("__id"), max("__id"),
      min(col("__v").cast("double")), max(col("__v").cast("double")))
      .collect().head
    if (!bounds.isNullAt(0))
      require(bounds.getLong(0) >= 0 && bounds.getLong(1) < (1L << 31),
        s"$verb needs ids in [0, 2^31): [${bounds.get(0)}, " +
          s"${bounds.get(1)}] would break the cross-engine hash")
    val nb = 256
    val width =
      if (bounds.isNullAt(2)) 0.0
      else (bounds.getDouble(3) - bounds.getDouble(2)) / nb
    val vMin = if (bounds.isNullAt(2)) 0.0 else bounds.getDouble(2)
    // monotone in __v by construction (shared literal width), so bucket
    // order refines value order and the per-bucket cut is exact
    val bucket = when(col("__v").isNull, lit(-1)).otherwise(
      if (width > 0)
        least(floor((col("__v").cast("double") - lit(vMin)) / lit(width)),
          lit(nb - 1)).cast("int")
      else lit(0))
    val part = (partCols :+ "__r").map(col)
    // pass 1: the base data rides as sentinel replicate -1 with weight
    // 1 (the point estimate shares every pass instead of paying its own
    // single-partition global sort over the source)
    val wsum = withPoissonDraws(base, replicates, seed)
      .select(partCols.map(col) ++
        Seq(col("__r"), bucket.as("__b"), col("__k")): _*)
      .unionAll(base.select(partCols.map(col) ++ Seq(
        lit(-1).as("__r"), bucket.as("__b"), lit(1).as("__k")): _*))
      .groupBy((partCols :+ "__r" :+ "__b").map(col): _*)
      .agg(sum("__k").as("__w"))
    val wrun = Window.partitionBy(part: _*).orderBy(col("__b"))
    val wall = Window.partitionBy(part: _*)
    // the first qualifying bucket always has __w > 0 (a zero-weight
    // bucket leaves the cumulative unchanged, so an earlier bucket
    // would already have qualified), hence __pre < target <= __wcum
    val marks = wsum
      .withColumn("__wcum", sum("__w").over(wrun))
      .withColumn("__tot", sum("__w").over(wall))
      .where(col("__tot") > 0 &&
        col("__wcum") * lit(qDen) >= col("__tot") * lit(qNum))
      .groupBy(part: _*)
      .agg(min("__b").as("__b"),
        min_by(col("__wcum") - col("__w"), col("__b")).as("__pre"),
        max("__tot").as("__tot"))
    // pass 2: rows after the in-bucket crossing all qualify and carry
    // the bucket's smallest qualifying value; rows of later buckets
    // qualify too but are strictly larger, so the in-bucket min IS the
    // global min — the full-frame window's answer
    val run = Window.partitionBy(part: _*)
      .orderBy(col("__v"), col("__id"))
    base
      .withColumn("__b", bucket)
      .join(broadcast(marks), partCols :+ "__b")
      .withColumn("__u", poissonU(col("__id"), col("__r"), seed))
      .withColumn("__k", when(col("__r") === lit(-1), lit(1))
        .otherwise(poissonKOfU(col("__u"))))
      .withColumn("__cum", col("__pre") + sum("__k").over(run))
      .where(col("__cum") * lit(qDen) >= col("__tot") * lit(qNum))
      .groupBy(part: _*)
      .agg(min("__v").as("__q"), max("__tot").as("__t"))
  }

  /** The id-domain guard every bootstrap verb shares — the
    * exportTrainingShards contract: ids in [0, 2^31), checked loudly
    * (negative ids split pmod from C-style %, larger ones overflow
    * differently across engines). One column-pruned agg over `__id`.
    */
  private def requireBootstrapIds(base: DataFrame, verb: String): Unit = {
    val bounds = base.agg(min("__id"), max("__id")).collect().head
    if (!bounds.isNullAt(0))
      require(bounds.getLong(0) >= 0 && bounds.getLong(1) < (1L << 31),
        s"$verb needs ids in [0, 2^31): [${bounds.get(0)}, " +
          s"${bounds.get(1)}] would break the cross-engine hash")
  }

  /** The shared draw machinery — ONE definition of the cross-engine
    * contract (the murmur-style finalizer chain and the inverse-CDF
    * fold), so the Spark side and every DuckDB twin can never
    * desynchronize through a fix applied to one copy: inflate `base`
    * (which must carry `__id`) to `replicates` rows per input row,
    * each with its Poisson(1) count `__k`.
    */
  private def withPoissonDraws(base: DataFrame, replicates: Int,
                               seed: Long): DataFrame =
    base
      .withColumn("__r", explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__u", poissonU(col("__id"), col("__r"), seed))
      .withColumn("__k", poissonKOfU(col("__u")))

  /** The uniform draw u(id, r) — the murmur-style finalizer chain that
    * breaks the multiplicative congruence's linearity (see
    * [[poissonBootstrap]]'s scaladoc for why a bare scramble
    * underdisperses). One definition for the exploded inflate AND the
    * re-derivation on already-(id, r)-keyed rows ([[quantileCuts]]'s
    * pass 2).
    */
  private def poissonU(id: Column, r: Column, seed: Long): Column = {
    val h1 = pmod(id * lit(2654435761L) + r * lit(seed),
      lit(4294967296L))
    val h2 = h1.bitwiseXOR(shiftright(h1, 16))
    val h3 = pmod(h2 * lit(1540483477L), lit(4294967296L))
    val h4 = h3.bitwiseXOR(shiftright(h3, 13))
    h4.cast("double") / lit(4294967296.0)
  }

  /** Inverse-CDF fold from a materialized uniform column (keep `u` a
    * real column — the 9-arm `when` chain re-evaluates its input per
    * arm without a common-subexpression anchor).
    */
  private def poissonKOfU(u: Column): Column =
    poisson1Cdf.zipWithIndex.foldRight(
        lit(poisson1Cdf.size): Column) {
      case ((c, i), rest) => when(u < lit(c), lit(i)).otherwise(rest)
    }

  /** DECIMAL(18,2) → exact long cents. The aggregates below sum cents
    * as plain longs instead of decimal(38,2) (hash-agg decimal buffers
    * measured ~2× the whole aggregation's cost at bench scale); the
    * value is identical — both are exact, order-independent integer
    * sums — and `centsToDouble` reproduces decimal→double casting
    * bit-for-bit: Java's `BigDecimal.doubleValue()` small-scale fast
    * path IS `(double)unscaled / 100.0` (exact while |cents| < 2⁵²,
    * i.e. 45 trillion currency units — far beyond the id contract's
    * 2³¹-row ceiling at any realistic per-row value; the oracle compare
    * re-proves equality at every driver SF).
    */
  private def cents(v: Column): Column = (v * 100).cast("long")

  private def centsToDouble(c: Column): Column =
    c.cast("double") / lit(100.0)

  private def bootstrapCore(df: DataFrame, groupCols: Seq[String],
                            idCol: String, valueCol: String,
                            replicates: Int, seed: Long): DataFrame = {
    require(replicates >= 4, s"replicates=$replicates")
    val reserved = Seq("__id", "__v", "__r", "__u", "__k", "__m",
      "__sv", "__n")
    (groupCols ++ Seq(idCol, valueCol)).foreach(c =>
      require(!reserved.contains(c), s"column name $c is reserved"))
    val base = df.select(groupCols.map(col) ++ Seq(
      col(idCol).cast("long").as("__id"),
      cents(col(valueCol).cast("decimal(18,2)")).as("__v")): _*)
    // the cross-engine contract needs ids in [0, 2^31): negative ids
    // split pmod from C-style %, larger ones overflow differently
    // across engines (the exportTrainingShards guard, both bounds)
    requireBootstrapIds(base, "poissonBootstrap")
    // one inflated scan: each (group, replicate) partial also carries
    // the group's base sum and row count (identical for every r — each
    // base row appears exactly once per replicate), so the point
    // estimate needs no second pass over the source
    val means = withPoissonDraws(base, replicates, seed)
      .groupBy((groupCols :+ "__r").map(col): _*)
      .agg(round(centsToDouble(sum(col("__k") * col("__v"))) /
          when(sum(col("__k")) =!= 0, sum(col("__k"))), 6).as("__m"),
        sum("__v").as("__sv"), count(lit(1)).as("__n"))
    val aggs = Seq(
      round(expr("percentile(__m, 0.025)"), 6).as("ci_lo"),
      round(expr("percentile(__m, 0.5)"), 6).as("ci_median"),
      round(expr("percentile(__m, 0.975)"), 6).as("ci_hi"),
      first("__n").as("n_rows"),
      round(centsToDouble(first("__sv")) / first("__n"), 6)
        .as("point_mean"))
    val outCols = groupCols.map(col) ++ Seq(
      lit(replicates).as("replicates"), col("n_rows"),
      col("point_mean"), col("ci_lo"), col("ci_median"), col("ci_hi"))
    val out =
      if (groupCols.isEmpty) means.agg(aggs.head, aggs.tail: _*)
      else means.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // empty input → zero rows (a global agg would emit one null row,
    // which the SQL twin's empty GROUP BY correctly does not)
    out.where(col("n_rows").isNotNull).select(outCols: _*)
  }
}
