package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-filter funnel — the C4/Gopher-shaped gate chain every LLM
  * corpus passes through before training (length gate, language gate,
  * quality score, repetition cap, PII screen), with the drop accounting
  * data engineers actually operate on: how many documents survive each
  * successive gate.
  *
  * Scale shape: all gates are narrow scan expressions (the TextAnalysis
  * family — codegen'd, no shuffle), evaluated in ONE pass; the funnel is a
  * single global aggregate of running-conjunction booleans (k+1 longs of
  * driver state for k gates), and [[keep]] is a plain filter that fuses
  * into whatever scan feeds it. Nothing here adds an exchange beyond the
  * one-row aggregate.
  */
object CorpusFilter {

  private def flagCols(gates: Seq[(String, Column)]): Seq[Column] =
    gates.zipWithIndex.map { case ((_, c), i) =>
      coalesce(c, lit(false)).as(s"__cf_p$i")
    }

  /** Rows surviving ALL gates (null gate values count as failures). */
  def keep(df: DataFrame, gates: Seq[(String, Column)]): DataFrame =
    df.where(gates.map { case (_, c) => coalesce(c, lit(false)) }
      .reduce(_ && _))

  /** Sequential funnel: one row per stage — (stage, gate, surviving),
    * where `surviving` counts docs passing gates 1..stage (stage 0 =
    * corpus total). Gate ORDER is the pipeline's order; a doc dropped by
    * an early gate is not re-tested downstream, matching how the kept set
    * is actually produced.
    */
  def funnel(df: DataFrame, gates: Seq[(String, Column)]): DataFrame = {
    require(gates.nonEmpty, "funnel needs at least one gate")
    val flags = df.select(flagCols(gates): _*)
    val running = gates.indices.map(i =>
      (0 to i).map(j => col(s"__cf_p$j")).reduce(_ && _))
    val aggs = count(lit(1)).cast("long").as("__cf_total") +:
      running.zipWithIndex.map { case (c, i) =>
        coalesce(sum(c.cast("long")), lit(0L)).as(s"__cf_s$i")
      }
    val one = flags.agg(aggs.head, aggs.tail: _*)
    // typed struct construction (no SQL string) — a gate name is data, not
    // syntax, so quotes/injection in caller-supplied names are inert
    val rows = struct(lit(0).as("stage"), lit("total").as("gate"),
      col("__cf_total").as("surviving")) +:
      gates.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(i + 1).as("stage"), lit(n).as("gate"),
          col(s"__cf_s$i").as("surviving"))
      }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.gate").as("gate"),
        col("r.surviving").as("surviving"))
  }
}
