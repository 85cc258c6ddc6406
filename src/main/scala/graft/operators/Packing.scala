package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign documents to fixed-token-budget
  * training sequences — the last batch-prep step before an LLM data loader.
  *
  * The assignment is cumulative, not bin-packing-optimal: within a shard,
  * documents in id order accumulate token counts, and a document belongs to
  * the sequence its FIRST token falls in (`floor((cumsum − n) / budget)`).
  * A document may straddle a boundary — exactly how streaming
  * concat-then-chunk tokenization behaves — so sequences average the budget
  * rather than capping at it. In exchange the whole assignment is one
  * window cumsum: deterministic, oracle-checkable, and free of the
  * sequential global state true first-fit packing needs.
  *
  * Scale shape: the window partitions by `shard`, so there is no global
  * single-partition sort — shard by anything evenly distributed (id mod k,
  * a hash, a date). Each shard packs independently; (shard, seq_id) is the
  * global sequence key.
  */
object Packing {

  def packByBudget(df: DataFrame, shardCol: String, idCol: String,
                   tokensCol: String, budget: Int): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum: Column = sum(col(tokensCol)).over(w)
    df.withColumn("seq_id",
      floor((cum - col(tokensCol)).cast("double") / budget).cast("long"))
  }
}
