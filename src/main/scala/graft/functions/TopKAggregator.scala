package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact top-k aggregator: keeps the k largest (score, payload) pairs
  * per group in a bounded buffer — the `Aggregator[IN, BUF, OUT]` form of a
  * custom aggregate (SURVEY.md §2.9 noted none is required for parity; this
  * is the extension-side example).
  *
  * Scale shape: the buffer is bounded at k elements, so partial aggregation
  * keeps at most k rows per (partition, group) — a grouped top-k over any
  * amount of data shuffles only k·groups rows, unlike a window + filter
  * which shuffles everything. Ties break toward the smaller payload id for
  * determinism.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // largest score first; equal scores → smaller id first
  private val desc: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
                      in: (Double, Long)): List[(Double, Long)] =
    (in :: buf).sorted(desc).take(k)

  override def merge(a: List[(Double, Long)],
                     b: List[(Double, Long)]): List[(Double, Long)] =
    (a ++ b).sorted(desc).take(k)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder()
}
