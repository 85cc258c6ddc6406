package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed character k-shingles of a string, as one native
  * expression: a Rabin–Karp rolling hash walks the text once (O(len), not
  * O(len·k)) and a finalizer mixes each window hash to 64 bits.
  *
  * Replaces `array_distinct(transform(sequence(...), substr))` +
  * per-element `xxhash64` in the MinHash hot path: the higher-order-function
  * form is interpreted per element with no subexpression elimination; this
  * is a single tight JVM loop per row that participates in whole-stage
  * codegen via a generated call.
  *
  * Windows advance one CODE POINT at a time (surrogate pairs are never
  * split), matching [[TextAnalysis.shingles]]'s `substr`-based windows —
  * Spark string functions count code points, and mixing the two shingle
  * paths on non-BMP text (emoji, rare CJK) must agree on window boundaries.
  */
case class HashedShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(input: UTF8String): ArrayData = {
    val s = input.toString
    // decode UTF-16 to code points once; the rolling hash then slides over
    // code-point values so the shingle alphabet is Unicode scalar values
    val cps = new Array[Int](s.length)
    var n = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(n) = cp; n += 1
      ci += Character.charCount(cp)
    }
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    val seen = new java.util.HashSet[java.lang.Long](math.min(n, 1 << 12))
    val out = new Array[Long](n - k + 1)
    var m = 0
    var j = 0
    while (true) {
      // murmur3 fmix64 — spreads the polynomial hash over all 64 bits
      var x = h
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      if (seen.add(x)) { out(m) = x; m += 1 }
      if (j + k >= n) {
        return new GenericArrayData(java.util.Arrays.copyOf(out, m))
      }
      h = (h - cps(j) * pow) * B + cps(j + k)
      j += 1
    }
    throw new IllegalStateException("unreachable")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hashedShingles", this,
      classOf[HashedShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpr =
    copy(child = newChild)
}

object HashedShingles {
  /** Distinct 64-bit-hashed character k-shingles as `array<long>`. */
  def hashedShingles(text: Column, k: Int): Column =
    GraftBridge.column(HashedShinglesExpr(GraftBridge.expression(text), k))
}
