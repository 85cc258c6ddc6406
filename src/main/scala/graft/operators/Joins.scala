package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join operators Spark lacks natively.
  *
  * [[asofJoin]] — for each left row, attach the single most recent right
  * row with `rightTs ≤ leftTs` within the same key (time-series point
  * lookup; DuckDB/kdb "ASOF JOIN").
  *
  * Implemented with the union trick rather than a range join: tag both
  * sides, union, and take `last(right_row, ignoreNulls)` over one
  * key-partitioned, time-ordered window. Cost at scale is ONE shuffle of
  * left+right on the key and a single ordered pass — no interval explosion,
  * no per-row subquery, and AQE-friendly. The right row travels as one
  * struct so all its fields come from the same matched row atomically.
  */
object Joins {

  /** Banded range join: pairs (l, r) with the same `key` and
    * `r.ts ∈ [l.ts + lower, l.ts + upper]` (bounds in seconds, inclusive).
    *
    * Naive inequality joins degenerate to per-key nested loops; here both
    * sides are bucketed by `width = upper − lower` and the left side probes
    * only the 2–3 buckets its window can overlap (an exploded equi-join),
    * then the exact predicate filters. Shuffle cost is O(|l|·3 + |r|) keyed
    * rows — independent of how many pairs the time window produces per key.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String,
                lowerSec: Long, upperSec: Long,
                rightPrefix: String = "r_"): DataFrame = {
    require(upperSec > lowerSec)
    val widthUs = (upperSec - lowerSec) * 1000000L
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    def us(c: org.apache.spark.sql.Column) = unix_micros(c.cast("timestamp"))
    val r = right.select(rCols.map(c => col(c).as(rightPrefix + c)): _*)
      .withColumn("__bucket",
        floor(us(col(rightPrefix + rightTs)) / widthUs))
    val loBucket = floor((us(col(leftTs)) + lowerSec * 1000000L) / widthUs)
    val hiBucket = floor((us(col(leftTs)) + upperSec * 1000000L) / widthUs)
    val l = left
      .withColumn("__bucket", explode(sequence(loBucket, hiBucket)))
    l.join(r, l("__bucket") === r("__bucket") &&
        l(key) === r(rightPrefix + key) &&
        us(r(rightPrefix + rightTs)) >= us(l(leftTs)) + lowerSec * 1000000L &&
        us(r(rightPrefix + rightTs)) <= us(l(leftTs)) + upperSec * 1000000L)
      .select(lCols.map(col) ++ rCols.map(c => col(rightPrefix + c)): _*)
  }

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPrefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__tag"),
      struct(lCols.map(col): _*).as("__lrow"),
      lit(null).cast(rType).as("__rrow"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__tag"),
      lit(null).cast(lType).as("__lrow"),
      struct(rCols.map(col): _*).as("__rrow"))
    // at equal timestamps the right row sorts first (tag 0 < 1), so a
    // same-instant right row IS visible to the probe — `≥` semantics,
    // matching DuckDB ASOF
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__m", last(col("__rrow"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(lCols.map(c => col(s"__lrow.$c").as(c)) ++
        rCols.map(c => col(s"__m.$c").as(rightPrefix + c)): _*)
  }

  /** Fuzzy (edit-distance) lookup join — the entity-resolution shape:
    * match every `probes` row against `corpus` rows whose `corpusText` is
    * within Levenshtein distance `maxDistance` of `probeText`.
    *
    * Blocking is the length bound: ed(a,b) ≤ d ⇒ |len(a) − len(b)| ≤ d —
    * exact-complete, like the Jaccard length prune in the dedup family.
    * Rather than a BETWEEN theta-join (which Spark plans as a nested-loop
    * over the whole corpus), each probe EXPLODES its 2d+1 candidate
    * lengths and the join is a plain equi-join on exact length, with the
    * small exploded probe side broadcast: the corpus is scanned once,
    * narrow, and only length-compatible pairs pay the O(len²) verify.
    * Returns (probe columns prefixed `probe_`, corpus columns, distance).
    *
    * Contract: `probes` is the lookup side — query-scale, broadcastable
    * (the entity-resolution shape). For a corpus-scale×corpus-scale fuzzy
    * self-join, block both sides on (length band, token prefix) with a
    * plain equi-join instead — the broadcast here would not fit.
    */
  def fuzzyJoin(probes: DataFrame, corpus: DataFrame, probeText: String,
                corpusText: String, maxDistance: Int): DataFrame = {
    require(maxDistance >= 0)
    val pCols = probes.columns.toSeq
    require(!pCols.contains("__len") && !corpus.columns.contains("__len"),
      "input schema may not contain the reserved column __len")
    require(!corpus.columns.contains("distance"),
      "corpus schema may not contain the reserved output column distance")
    val p = probes.select(
      struct(pCols.map(col): _*).as("__prow"),
      explode(sequence(length(col(probeText)) - maxDistance,
        length(col(probeText)) + maxDistance)).as("__len"))
    // distance materialized BEFORE the filter: filter and project are
    // separate operators with no common-subexpression elimination between
    // them, so a where(levenshtein)+select(levenshtein) pair would run
    // the O(len²) verify twice per surviving row
    corpus.withColumn("__len", length(col(corpusText)))
      .join(broadcast(p), "__len")
      .withColumn("distance",
        levenshtein(col(s"__prow.$probeText"), col(corpusText)))
      .where(col("distance") <= maxDistance)
      .select(pCols.map(c => col(s"__prow.$c").as(s"probe_$c")) ++
        corpus.columns.toSeq.map(col) :+ col("distance"): _*)
  }

  /** Corpus-scale fuzzy SELF-join: every pair within Levenshtein distance
    * `maxDistance`, as (id_a, id_b, distance) with id_a < id_b — the
    * variant [[fuzzyJoin]]'s contract excludes (both sides corpus-scale,
    * nothing broadcastable). Segment blocking in the PassJoin family
    * (Li, Deng & Feng, "PASS-JOIN: a partition-based method for similarity
    * joins", VLDB 2012 — public literature), expressed as ONE plain
    * equi-join: no broadcast, no nested loop, no theta-join.
    *
    * RECALL-COMPLETENESS ARGUMENT (why no qualifying pair can be missed):
    * every string is split into k = d+1 contiguous segments (even split —
    * the first `len mod k` segments one char longer). If ed(a, b) ≤ d with
    * len(b) ≤ len(a), fix an optimal alignment: its ≤ d edit operations
    * each touch at most one of b's k segments, so BY PIGEONHOLE some
    * segment i of b is edit-free — it appears VERBATIM in a. Its start
    * position in a equals its start p_i in b shifted by the net
    * insert/delete count to its left, which is bounded by ±d. The probe
    * side therefore enumerates, for every partner length L ∈
    * [len(a) − d, len(a)] and every segment index i, ALL substrings of a
    * with segment i's length starting within [p_i − d, p_i + d] — a
    * superset of what the argument requires — and the index side emits
    * every (L, i, segment) of b verbatim. The equi-join on (L, i, segment)
    * thus catches every qualifying pair at least once; the exact
    * `levenshtein ≤ d` verify (after pair-level dedup, so multi-segment
    * collisions cost ONE verify) makes precision exact. Probing only
    * DOWNWARD lengths (L ≤ len(a)) loses nothing: the longer member of
    * each pair is the prober, and equal-length pairs probe both ways
    * (deduped by id normalization).
    *
    * Scale shape: index side emits k rows per string (short segment keys),
    * probe side ≤ k·(d+1)·(2d+1) rows — both linear in the corpus with
    * small constants for the small d this operator targets; the join is a
    * hash shuffle on (L, i, segment). Block population is data-dependent:
    * a segment shared corpus-wide (a common prefix) degrades that block to
    * its within-block quadratic — raise d's segment count or pre-strip
    * known boilerplate prefixes if a profile shows one hot block.
    */
  def fuzzySelfJoin(df: DataFrame, idCol: String, textCol: String,
                    maxDistance: Int): DataFrame = {
    require(maxDistance >= 1, "maxDistance 0 is exact dedup — use Dedup.exact")
    val d = maxDistance
    val k = d + 1
    require(!df.columns.exists(_.startsWith("__fz")),
      "input schema may not contain __fz-prefixed columns")
    // even segment split of a length-L string: segment i (0-based) has
    // length base + 1 for i < rem, else base; start = i*base + min(i, rem)
    def segLen(L: Column, i: Int): Column =
      floor(L / k).cast("int") +
        when(lit(i) < pmod(L, lit(k)), lit(1)).otherwise(lit(0))
    def segStart(L: Column, i: Int): Column =
      (lit(i) * floor(L / k).cast("int") +
        least(lit(i), pmod(L, lit(k)))).cast("int")
    val L = length(col(textCol))
    val segType = "array<struct<pl:int,si:int,seg:string>>"
    // index side: the k verbatim segments of every string
    val idx = df.select(col(idCol).as("__fzid_s"),
        col(textCol).as("__fztxt_s"),
        explode(array((0 until k).map { i =>
          struct(L.as("pl"), lit(i).as("si"),
            col(textCol).substr(segStart(L, i) + 1, segLen(L, i)).as("seg"))
        }: _*)).as("__fzc"))
      .select(col("__fzid_s"), col("__fztxt_s"),
        col("__fzc.pl").as("__fzpl"), col("__fzc.si").as("__fzsi"),
        col("__fzc.seg").as("__fzseg"))
    // probe side: for each partner length L' ∈ [len−d, len] and segment i,
    // all substrings of segment-i length starting within ±d of its
    // partner-side position (window clamped to the string)
    val cands = (0 to d).flatMap { delta =>
      (0 until k).map { i =>
        val lp = L - delta
        val li = segLen(lp, i)
        val pi = segStart(lp, i)
        val lo = greatest(lit(0), pi - d)
        val hi = least(L - li, pi + d)
        coalesce(
          when(lp >= lit(0) && lo <= hi, // lp 0 = empty partner: its
            // segments are all "", verbatim anywhere — keep it probed
            transform(sequence(lo, hi), st =>
              struct(lp.as("pl"), lit(i).as("si"),
                col(textCol).substr(st + 1, li).as("seg")))),
          array().cast(segType))
      }
    }
    val probe = df.select(col(idCol).as("__fzid_r"),
        col(textCol).as("__fztxt_r"),
        explode(flatten(array(cands: _*))).as("__fzc"))
      .select(col("__fzid_r"), col("__fztxt_r"),
        col("__fzc.pl").as("__fzpl"), col("__fzc.si").as("__fzsi"),
        col("__fzc.seg").as("__fzseg"))
    probe.join(idx, Seq("__fzpl", "__fzsi", "__fzseg"))
      .where(col("__fzid_r") =!= col("__fzid_s"))
      .select(
        least(col("__fzid_r"), col("__fzid_s")).as("id_a"),
        greatest(col("__fzid_r"), col("__fzid_s")).as("id_b"),
        when(col("__fzid_r") < col("__fzid_s"), col("__fztxt_r"))
          .otherwise(col("__fztxt_s")).as("__fzta"),
        when(col("__fzid_r") < col("__fzid_s"), col("__fztxt_s"))
          .otherwise(col("__fztxt_r")).as("__fztb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("distance", levenshtein(col("__fzta"), col("__fztb")))
      .where(col("distance") <= d)
      .select("id_a", "id_b", "distance")
  }

  /** Fuzzy join of TWO corpus-scale frames — the cell [[fuzzyJoin]]'s
    * broadcast contract excludes (neither side fits a broadcast) and
    * [[fuzzySelfJoin]] covers only within one frame. Pure COMPOSITION,
    * zero new algorithm code: fold both sides into one id space with the
    * PARITY as the side tag (left ids → 2·id, right → 2·id + 1), run the
    * PassJoin self-join once over the union, keep only the cross-parity
    * pairs, shift the ids back. Completeness and exactness are inherited
    * verbatim from [[fuzzySelfJoin]]'s recall argument; the premium is
    * the within-side candidates the union admits — work [[fuzzySelfJoin]]
    * would do anyway on each side separately, paid here in one job.
    *
    * Ids must be non-negative longs below 2^62 (checked IN the id
    * expression, so a violating row fails the job loudly instead of
    * silently colliding). Returns (`lIdCol`, `rIdCol`, distance) —
    * each qualifying cross pair exactly once.
    */
  def fuzzyCrossJoin(left: DataFrame, lIdCol: String, lStrCol: String,
                     right: DataFrame, rIdCol: String, rStrCol: String,
                     maxDistance: Int): DataFrame = {
    require(lIdCol != rIdCol,
      s"output id columns must differ, got '$lIdCol' twice")
    require(lIdCol != "distance" && rIdCol != "distance",
      "'distance' is the reserved output column")
    def tagged(df: DataFrame, idC: String, strC: String,
               parity: Int): DataFrame = {
      val id = col(idC).cast("long")
      // assert_true rides INSIDE the id expression — it cannot be
      // pruned away, so a bad id fails the job instead of colliding
      df.select(
        when(assert_true(id >= 0 && id < Long.MaxValue / 2,
            lit(s"fuzzyCrossJoin ids must be in [0, 2^62), got a " +
              s"violating '$idC'")).isNull,
          id * 2 + parity).as("__fcj_id"),
        col(strC).as("__fcj_txt"))
    }
    val pairs = fuzzySelfJoin(
      tagged(left, lIdCol, lStrCol, 0)
        .unionByName(tagged(right, rIdCol, rStrCol, 1)),
      "__fcj_id", "__fcj_txt", maxDistance)
    pairs
      .where(pmod(col("id_a"), lit(2)) =!= pmod(col("id_b"), lit(2)))
      .select(
        shiftright(when(pmod(col("id_a"), lit(2)) === 0, col("id_a"))
          .otherwise(col("id_b")), 1).as(lIdCol),
        shiftright(when(pmod(col("id_a"), lit(2)) === 1, col("id_a"))
          .otherwise(col("id_b")), 1).as(rIdCol),
        col("distance"))
  }
}
