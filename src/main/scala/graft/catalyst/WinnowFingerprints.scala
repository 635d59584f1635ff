package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing kernel: `array<string>` tokens → `array<long>` of
  * packed fingerprints `(md5₄₀(gram) << 20) | pos` (pos = 1-based gram
  * start), selecting the RIGHTMOST minimal n-gram hash of every length-w
  * window (Schleimer et al. 2003).
  *
  * Value-identical (as a set) to the composed fold in
  * [[graft.functions.Dedup.winnow]], but O(G) instead of O(G·w): a
  * monotone deque carries window minima — pushing gram e pops every
  * queued hash ≥ h(e) (the `≥` makes the front the rightmost minimum,
  * the same tie rule as the fold's `<=`), and each gram enters/leaves
  * the deque exactly once. Consecutive windows re-selecting the same
  * gram dedup inline (the selection position is provably non-decreasing,
  * so repeats are always adjacent). Fewer than w grams → empty array.
  */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  protected override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.WinnowFingerprints.compute($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val PosBits = 20

  def compute(tokens: ArrayData, n: Int, w: Int): ArrayData = {
    val L = tokens.numElements()
    val G = L - n + 1
    if (G < w) return new GenericArrayData(Array.emptyLongArray)
    require(G < (1 << PosBits),
      s"winnow_fp: document has $G grams, packing supports < ${1 << PosBits}" +
        " — split the document or widen the position field")
    // gram hashes: each token string is appended once per covering gram;
    // concat_ws semantics (null tokens skipped entirely) mirrored
    val h = new Array[Long](G)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < G) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        if (!tokens.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      h(i) = Md5Prefix40.hash(UTF8String.fromString(sb.toString))
      i += 1
    }
    // monotone deque of gram indices; h strictly increases front→back
    val deque = new Array[Int](G)
    var head = 0
    var tail = 0
    val out = new scala.collection.mutable.ArrayBuffer[Long](G / w + 1)
    var last = -1
    var e = 0
    while (e < G) {
      while (tail > head && h(deque(tail - 1)) >= h(e)) tail -= 1
      deque(tail) = e
      tail += 1
      val s = e - w + 1
      if (s >= 0) {
        while (deque(head) < s) head += 1
        val sel = deque(head)
        if (sel != last) {
          out += (h(sel) << PosBits) | (sel + 1).toLong
          last = sel
        }
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WinnowFingerprints(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), n, w))
}

/** WIDE (60-bit) winnowing kernel: `array<string>` tokens → `array<long>`
  * of the per-doc DISTINCT selected gram hashes, where both the window
  * minimum selection AND the emitted key ride [[Md5Prefix60]] — the
  * corpus-scale twin of [[WinnowFingerprints]]. 40-bit keys birthday-bound
  * at ~2^20 distinct grams; one measured collision at the synthesized sf1
  * already chained two unrelated dedup families (diameter 19 → 27), so at
  * 100 TB the persisted index layout must be keyed wide. 60-bit keys push
  * the bound to ~2^30 distinct grams.
  *
  * Positions are DROPPED: every persisted-index / cluster / family
  * consumer is position-free (matching is position-robust by design), and
  * dropping them removes the (h << 20 | pos) packing — and with it the
  * narrow kernel's G < 2^20 document-length cap. Selection per window is
  * the minimum HASH VALUE (tie positions select the same value, so the
  * value set needs no tie rule); the same monotone deque gives O(G).
  * Output order is first-selection order; consumers treat it as a set.
  * Fewer than w grams → empty array.
  */
case class WinnowHashes60(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_h60 requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_h60"

  protected override def nullSafeEval(input: Any): Any =
    WinnowHashes60.compute(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.WinnowHashes60.compute($c, $n, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes60 =
    copy(child = newChild)
}

object WinnowHashes60 {
  def compute(tokens: ArrayData, n: Int, w: Int): ArrayData = {
    val L = tokens.numElements()
    val G = L - n + 1
    if (G < w) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](G)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < G) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        if (!tokens.isNullAt(i + j)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      h(i) = Md5Prefix60.hash(UTF8String.fromString(sb.toString))
      i += 1
    }
    val deque = new Array[Int](G)
    var head = 0
    var tail = 0
    val out = new scala.collection.mutable.ArrayBuffer[Long](G / w + 1)
    val seen = new scala.collection.mutable.HashSet[Long]
    var e = 0
    while (e < G) {
      while (tail > head && h(deque(tail - 1)) >= h(e)) tail -= 1
      deque(tail) = e
      tail += 1
      val s = e - w + 1
      if (s >= 0) {
        while (deque(head) < s) head += 1
        val v = h(deque(head))
        if (seen.add(v)) out += v
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      WinnowHashes60(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), n, w))
}
