package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** One-pass native kernels for the token-level text operators — same
  * rationale as [[MinHashSig]]: the composed higher-order-function forms
  * re-walk the token array per component and pay interpreted-lambda
  * overhead; these evaluate in a single pass with one md5 per token and
  * stay inside whole-stage codegen. Each is value-identical to the Column
  * pipeline it replaces (the DuckDB oracles don't change).
  */

/** Positional rolling-hash fingerprint:
  * Σ md5₄₀(tᵢ)·((i mod 8)+1) mod 1e9+7 — order-sensitive. Identical to
  * `graft.functions.TextAnalysis.fingerprint`'s aggregate form. */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  protected override def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.RollingFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  val Mod = 1000000007L
  def compute(tokens: ArrayData): Long = {
    var acc = 0L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i))
        acc += Md5Prefix40.hash(tokens.getUTF8String(i)) * ((i % 8) + 1)
      i += 1
    }
    acc % Mod
  }
  def apply(c: Column): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(c)))
}

/** 32-bit SimHash over the token multiset — identical to
  * `graft.functions.Dedup.simhash32`'s nested-aggregate form. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  protected override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def compute(tokens: ArrayData): Long = {
    val sums = new Array[Long](32)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = Md5Prefix40.hash(tokens.getUTF8String(t))
        var j = 0
        while (j < 32) {
          sums(j) += ((h >> j) & 1L) * 2L - 1L
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (sums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))
}
