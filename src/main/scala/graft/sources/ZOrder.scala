package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Parquet row-group pruning works off per-file/rowgroup min-max stats,
  * which only help along the sort order: a table sorted by `a` skips
  * nothing for filters on `b`. Interleaving the bits of both columns into
  * one Morton code and range-sorting by IT gives every file a tight
  * bounding BOX in (a, b) space — filters on either (or both) dimensions
  * prune files. The classic lakehouse layout technique (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), expressed with plain Spark: an integer-arithmetic
  * expression + `repartitionByRange` + `sortWithinPartitions`.
  *
  * The z-value is pure codegen'd bit arithmetic — reproducible in any
  * engine (the DuckDB oracle runs the same shifts), no UDF, no shuffle
  * beyond the one range exchange the layout itself requires.
  */
object ZOrder {

  /** The Morton code interleaving the low `bits` of each column: bit `i`
    * of column `j` lands at position `i * cols.size + j`. Columns are
    * masked to `bits`, so out-of-range values wrap rather than dominate
    * the high bits.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.size <= 63)
    val masked = cols.map(_.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    (0 until bits).flatMap { i =>
      masked.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * cols.size + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-order-clustered on `clusterCols`: one range exchange on
    * the Morton code, an in-partition sort, `partitions` output files each
    * covering a tight bounding box of the clustered dimensions.
    */
  def clusteredWrite(df: DataFrame, path: String, clusterCols: Seq[String],
                     bits: Int = 16, partitions: Int = 8): Unit = {
    val z = zValue(clusterCols.map(col), bits)
    df.repartitionByRange(partitions, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
