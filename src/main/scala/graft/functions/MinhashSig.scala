package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a hashed-shingle set as ONE native expression: a
  * tight JVM loop over the shingle array updating a `numHashes`-wide
  * running-min accumulator (universal hashing h_i(x) = (a_i·x + b_i) mod p
  * over a 2^31 space — same scheme as [[graft.operators.Dedup.sigFromShingles]]).
  *
  * This replaces the explode → 32-way min-aggregate formulation: per corpus
  * the exploded form shuffles |shingles| rows (thousands per document)
  * through a hash aggregate, while this expression emits the finished
  * 32-long signature per document with NO shuffle at all — signatures are
  * born narrow, and only the banded (band, hash) pairs ever cross the wire.
  * At 100 TB that removes the largest exchange in the dedup pipeline.
  *
  * Empty or null shingle sets yield a null signature (they can never
  * LSH-match), mirroring the explode form's drop semantics.
  */
case class MinhashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0)

  // wrong-typed SQL misuse fails at analysis, not with a runtime CCE
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set → null signature

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val aCoefs: Array[Long] =
    Array.tabulate(numHashes)(i => (2654435761L * (i * 2 + 1)) % P + 1)
  private val bCoefs: Array[Long] =
    Array.tabulate(numHashes)(i => (40503L * (i + 7) * (i + 13) + 17L) % P)

  def compute(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val m = new Array[Long](numHashes)
    java.util.Arrays.fill(m, P)
    var j = 0
    while (j < n) {
      // fold the 64-bit shingle hash into [0, 2^31): x·a < 2^62 never
      // overflows a signed long
      val s = sh.getLong(j) % 2147483648L
      val x = if (s < 0) s + 2147483648L else s
      var i = 0
      while (i < numHashes) {
        val v = (x * aCoefs(i) + bCoefs(i)) % P
        if (v < m(i)) m(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(m)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashSig", this,
      classOf[MinhashSigExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $self.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSig {
  /** `numHashes`-long MinHash signature of an `array<long>` shingle-hash
    * set; null for empty sets.
    */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinhashSigExpr(GraftBridge.expression(shingles), numHashes))
}
