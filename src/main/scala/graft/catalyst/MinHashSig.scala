package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass MinHash signature: `array<string>` tokens → `array<long>` of k
  * components hᵢ = min over tokens of ((md5₄₀(t) mod P)·aᵢ + bᵢ mod P).
  *
  * Value-identical to the composed Column form
  * (`graft.functions.Dedup.minhashSignature`'s let-bound transform/min
  * pipeline) but evaluates in ONE token pass with zero intermediate
  * arrays: each token is hashed once and folded into all k running minima.
  * The composed form materializes k permuted arrays per row; this is the
  * "codegen'd similarity kernel" called out as the custom-expression
  * candidate in SURVEY.md §7.3.
  *
  * Duplicate tokens need no dedup — duplicates cannot change a minimum —
  * so callers can skip `array_distinct`.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P: Long = 2147483647L // 2^31-1, matches graft.functions.Dedup.P
  @inline def aCoef(i: Int): Long = (2654435761L * (i + 1)) % P
  @inline def bCoef(i: Int): Long = (40503L * (i + 7)) % P

  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        seen = true
        val h = Md5Prefix40.hash(tokens.getUTF8String(t)) % P
        var i = 0
        while (i < k) {
          val v = (h * aCoef(i) + bCoef(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    // no usable tokens → null components (matches array_min of empty)
    if (!seen) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins)
  }

  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), k))
}
