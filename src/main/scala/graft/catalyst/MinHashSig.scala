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

/** WIDE (61-bit) MinHash signature — the corpus-scale twin of
  * [[MinHashSig]]: hᵢ = min over tokens of ((md5₆₀(t)·aᵢ + bᵢ) mod P₆₁)
  * with P₆₁ = 2⁶¹−1 (Mersenne prime) over the 60-bit [[Md5Prefix60]]
  * token hash.
  *
  * Why it exists: the narrow signature reduces every token to
  * `md5₄₀(t) mod P₃₁` — two distinct tokens congruent mod 2³¹−1 behave
  * IDENTICALLY in every permutation (hᵢ is affine in the reduced value),
  * so one ~2³¹-birthday token collision can equate two docs' signatures
  * and chain unrelated near-dup families through shared band buckets,
  * with no error anywhere (the winnow-collision failure mode, measured
  * at the synthesized sf1, transplanted to MinHash). The wide form moves
  * that bound to ~2⁶¹.
  *
  * The product md5₆₀(t)·aᵢ is up to ~2⁹⁵, so the modmul runs 128-bit via
  * `Math.multiplyHigh` + the Mersenne fold (2⁶⁴ ≡ 8 mod P₆₁); the DuckDB
  * oracle reproduces the same value in HUGEINT arithmetic. */
case class MinHashSig61(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig61 requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig61"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig61.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.MinHashSig61.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig61 =
    copy(child = newChild)
}

object MinHashSig61 {
  val P61: Long = 2305843009213693951L // 2^61-1 (Mersenne prime)
  // same generator constants as the narrow path, NOT reduced mod P31 —
  // small enough that aᵢ·(i+1) never overflows and nonzero mod P61
  @inline def aCoef(i: Int): Long = 2654435761L * (i + 1)
  @inline def bCoef(i: Int): Long = 40503L * (i + 7)

  /** (a·b) mod P₆₁ for non-negative operands whose PRODUCT stays below
    * 2¹²¹ (so the folded sum (hi << 3) + (lo >>> 61) + (lo & P₆₁) fits a
    * signed 64-bit long — operands near 2⁶² would overflow it silently).
    * Callers here keep a < 2⁶⁰ (the token hash) and b < 2³⁸ (the
    * coefficients). 128-bit product via multiplyHigh, folded with
    * 2⁶⁴ ≡ 8 (mod 2⁶¹−1). */
  @inline def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // a·b = hi·2⁶⁴ + lo ≡ hi·8 + (lo >>> 61) + (lo & P61)
    var s = (hi << 3) + (lo >>> 61) + (lo & P61)
    s = (s & P61) + (s >>> 61)
    if (s >= P61) s - P61 else s
  }

  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        seen = true
        val h = Md5Prefix60.hash(tokens.getUTF8String(t))
        var i = 0
        while (i < k) {
          var v = mulMod(h, aCoef(i)) + bCoef(i)
          if (v >= P61) v -= P61
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    if (!seen) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(mins)
  }

  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashSig61(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), k))
}
