package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All sliding `k`-token window fingerprints of a token array in ONE
  * native O(T) pass: per token a splitmix64-finalized byte hash, then a
  * polynomial rolling combine over the window (mod 2⁶⁴) — window i's
  * fingerprint is `Σ_j h(tok_{i+j}) · B^{k-1-j}`, maintained by one
  * multiply-add-subtract per slide. Output: `array<long>` of length
  * `max(0, T − k + 1)` (docs shorter than k have no full window).
  *
  * Exists for [[graft.operators.Dedup.removeDuplicatedSpans]]'s
  * `keyByHash` mode, whose window KEY only needs to agree exactly when
  * window token sequences agree (grouping key, never an output): the
  * previous key materialized every window's k-token STRING through an
  * interpreted `transform(slice + array_join)` lambda — O(T·k)
  * interpreted string building per document — before hashing it. Same
  * collision trade as the xxhash64(window-text) key it replaces
  * (~2⁻⁶⁴ per distinct-window pair, documented at the caller); the
  * polynomial combine additionally distinguishes token ORDER like the
  * joined string did. Null token arrays → null; null elements are
  * hashed as the empty token (split() never produces them).
  */
case class TokenWindowHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k=$k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_window_hashes requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val B = 0x100000001B3L // odd multiplier (FNV prime, 64-bit)

  private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def tokenHash(t: org.apache.spark.unsafe.types.UTF8String): Long = {
    if (t == null) return mix(0L)
    val bytes = t.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xFFL)) * B; i += 1 }
    mix(h)
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val wins = n - k + 1
    if (wins <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = tokenHash(arr.getUTF8String(i)); i += 1 }
    // Bk = B^(k-1): the weight of the window's leading token
    var bk = 1L
    i = 1
    while (i < k) { bk *= B; i += 1 }
    val out = new Array[Long](wins)
    var acc = 0L
    i = 0
    while (i < k) { acc = acc * B + hs(i); i += 1 }
    out(0) = acc
    i = 1
    while (i < wins) {
      acc = (acc - hs(i - 1) * bk) * B + hs(i + k - 1)
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tokenWindowHashes", this,
      classOf[TokenWindowHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$self.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenWindowHashesExpr = copy(child = newChild)
}

object TokenWindowHashes {
  def tokenWindowHashes(words: Column, k: Int): Column =
    GraftBridge.column(TokenWindowHashesExpr(
      GraftBridge.expression(words), k))
}
