package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler — the data-quality summary a pipeline runs
  * over every new 100 TB drop before spending compute on it: per column,
  * row/null/distinct counts and typed min/max, as ONE aggregation over ONE
  * scan (never k per-column passes).
  *
  * Distinct counting is the scale decision: the default is
  * `approx_count_distinct` (HLL — single pass, mergeable, no data
  * expansion); `exact = true` switches to exact multi-column distinct,
  * which Catalyst plans via Expand — still one scan, but the scanned rows
  * are replicated once per profiled column before partial aggregation, a
  * cost worth paying only at oracle/validation scale. Min/max keep the
  * column's own type lane: numerics surface as doubles (`min_num`),
  * everything else through its string form (`min_str`) — no lossy
  * cross-type coercion into one column.
  */
object Profile {

  /** Long-format profile of `cols` (default: all columns): one row per
    * column — (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    * min_str, max_str). The single aggregated row is pivoted to long form
    * with an inline explode, so the result stays a distributed plan.
    */
  def summary(df: DataFrame, cols: Seq[String] = Nil,
              exact: Boolean = false, rsd: Double = 0.05): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "no columns to profile")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    names.foreach(n => require(types.contains(n), s"no such column: $n"))
    def isNum(t: DataType): Boolean = t match {
      case _: NumericType => true
      case _ => false
    }
    val aggs: Seq[Column] = names.flatMap { n =>
      val c = col(n)
      val distinct =
        if (exact) count_distinct(c) else approx_count_distinct(c, rsd)
      val (minNum, maxNum, minStr, maxStr) =
        if (isNum(types(n)))
          (min(c).cast("double"), max(c).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        else
          (lit(null).cast("double"), lit(null).cast("double"),
            min(c).cast("string"), max(c).cast("string"))
      Seq(count(c).as(s"__p_${n}_nn"), distinct.as(s"__p_${n}_nd"),
        minNum.as(s"__p_${n}_mn"), maxNum.as(s"__p_${n}_mxn"),
        minStr.as(s"__p_${n}_ms"), maxStr.as(s"__p_${n}_mxs"))
    }
    val one = df.agg(count(lit(1)).as("__p_rows"), aggs: _*)
    val rows = array(names.map { n =>
      struct(lit(n).as("col_name"), col("__p_rows").as("n_rows"),
        (col("__p_rows") - col(s"__p_${n}_nn")).as("n_nulls"),
        col(s"__p_${n}_nd").as("n_distinct"),
        col(s"__p_${n}_mn").as("min_num"), col(s"__p_${n}_mxn").as("max_num"),
        col(s"__p_${n}_ms").as("min_str"), col(s"__p_${n}_mxs").as("max_str"))
    }: _*)
    one.select(inline(rows))
  }

  /** Grouped z-score outliers — the per-segment anomaly scan run over a
    * metrics drop before it enters training or reporting: rows whose
    * `valueCol` sits more than `zThreshold` sample standard deviations
    * from their group's mean. One grouped aggregation (map-side combined,
    * output sublinear in rows) joined back on the group key, then a
    * narrow filter — groups with fewer than two rows or zero variance
    * emit nothing (z is undefined there, not infinite). Returns the
    * input columns plus `z`.
    */
  def outliers(df: DataFrame, keyCols: Seq[String], valueCol: String,
               zThreshold: Double = 3.0): DataFrame = {
    require(keyCols.nonEmpty, "need at least one group column")
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    require(!df.columns.exists(_.startsWith("__ol_")),
      "input already carries __ol_-prefixed internals")
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(avg(valueCol).as("__ol_mean"),
        stddev_samp(valueCol).as("__ol_sd"))
    val z = (col(valueCol) - col("__ol_mean")) / col("__ol_sd")
    df.join(stats, keyCols)
      .where(col("__ol_sd") > 0 && abs(z) > zThreshold)
      .withColumn("z", z)
      .drop("__ol_mean", "__ol_sd")
  }

  /** Grouped simple linear regression (OLS of y on x) in ONE
    * aggregation pass: slope, intercept, Pearson correlation and r²
    * per group from the five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) —
    * the closed form, no iteration, no second scan, map-side partial
    * aggregation doing the heavy lifting. Rows where either side is
    * null are excluded (pairwise deletion, the `REGR_*` convention).
    * Groups with fewer than 2 points or zero x-variance serve null
    * slope/intercept (a vertical or single-point fit is not a line);
    * r²/corr additionally null when y-variance is zero. Exact moment
    * arithmetic — the formulas are plain SQL, so query rows over this
    * carry full DuckDB oracles.
    */
  def olsByGroup(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val both = x.isNotNull && y.isNotNull
    val base = df.where(both)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sx2"),
        sum(y * y).as("sy2"))
    val n = col("n").cast("double")
    val covN = col("sxy") - col("sx") * col("sy") / n  // n·cov(x,y)
    val varXN = col("sx2") - col("sx") * col("sx") / n // n·var(x)
    val varYN = col("sy2") - col("sy") * col("sy") / n
    val slope = when(col("n") >= 2 && varXN > 0, covN / varXN)
    val corr = when(col("n") >= 2 && varXN > 0 && varYN > 0,
      covN / sqrt(varXN * varYN))
    base
      .withColumn("slope", slope)
      .withColumn("intercept",
        (col("sy") - slope * col("sx")) / n)
      .withColumn("corr", corr)
      .withColumn("r2", corr * corr)
      .drop("sx", "sy", "sxy", "sx2", "sy2")
  }

  /** CUSUM statistics over an ordered series: per point,
    * `cusum_i = Σ_{j≤i} x_j − i·mean(x)` — the classic Page/Pettitt
    * mean-shift trace whose extremum locates the most likely changepoint
    * (before a level shift the deviations accumulate one way, after it
    * they unwind; a no-change series random-walks near zero).
    *
    * Scale contract, stated plainly: this runs a GLOBAL-ORDER window
    * (one partition), so `df` must be an already-aggregated bounded
    * series — days/hours of a KPI (thousands of rows), never raw events.
    * The distributed work is the upstream `groupBy(day)` that produced
    * the series; the monitor itself is o(1) of corpus scale. This is the
    * same bounded-series stance as [[graft.operators.Divergence]].
    *
    * Exactness: with an integral `valueCol` the running sum is exact
    * long arithmetic; the one float enters at `mean = total / n`, and
    * `round(rsum − rn·mean, 6)` is a fixed two-op tail — query rows
    * over integral series carry FULL DuckDB oracles (the house
    * sums-then-formula discipline).
    *
    * Output: (orderCol, value, cusum), one row per input point.
    */
  def cusum(df: DataFrame, orderCol: String, valueCol: String)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(orderCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val v = col(valueCol).cast("long")
    val totals = df.agg(sum(v).as("__cs_total"),
      count(lit(1)).as("__cs_n"))
    df.select(col(orderCol), v.as("value"))
      .withColumn("__cs_rsum", sum(col("value")).over(w))
      .withColumn("__cs_rn", count(lit(1)).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("cusum",
        round(col("__cs_rsum") -
          col("__cs_rn") * (col("__cs_total").cast("double") /
            col("__cs_n")), 6))
      .select(col(orderCol), col("value"), col("cusum"))
  }

  /** Seasonal-baseline anomaly scores: each point's deviation from ITS
    * season's mean, in season-σ units — "is this Monday odd FOR A
    * MONDAY", the question a raw threshold can't ask of a series with a
    * weekly/daily pulse. `seasonCol` is any bounded season id (the
    * query uses epoch-day mod 7: calendar-function-free, so both
    * engines derive the identical season); seasons with < 2 points or
    * zero variance serve a null z, not a NaN.
    *
    * Same bounded-series stance as [[cusum]]: the input is the
    * post-aggregation series, the per-season moment table is
    * season-count-sized and broadcasts. Exact double moment sums feed a
    * fixed-order formula (the [[olsByGroup]] discipline), so query rows
    * over it carry full DuckDB oracles.
    *
    * Output: (orderCol, seasonCol, value, season_mean, z).
    */
  def seasonalAnomaly(df: DataFrame, orderCol: String, seasonCol: String,
                      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val m = df.groupBy(col(seasonCol))
      .agg(count(lit(1)).as("__sa_n"), sum(v).as("__sa_s1"),
        sum(v * v).as("__sa_s2"))
    val varN = (col("__sa_s2") -
      col("__sa_s1") * col("__sa_s1") / col("__sa_n")) /
      (col("__sa_n") - 1)
    df.join(broadcast(m), Seq(seasonCol))
      .withColumn("season_mean", col("__sa_s1") / col("__sa_n"))
      .withColumn("z",
        when(col("__sa_n") >= 2 && varN > 0,
          (v - col("season_mean")) / sqrt(varN)))
      .select(col(orderCol), col(seasonCol), v.as("value"),
        col("season_mean"), col("z"))
  }

  /** The most likely changepoint of the series: the point maximizing
    * |cusum|, earliest point on ties — one row (orderCol, value, cusum,
    * abs_cusum). The caller thresholds `abs_cusum` against its own
    * history (e.g. [[graft.sources.SketchSidecar.batchAnomaly]]'s z
    * discipline) to decide whether the shift is real.
    */
  def changepoint(df: DataFrame, orderCol: String, valueCol: String)
      : DataFrame =
    cusum(df, orderCol, valueCol)
      .withColumn("abs_cusum", abs(col("cusum")))
      .orderBy(col("abs_cusum").desc, col(orderCol).asc)
      .limit(1)
}
