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
}
