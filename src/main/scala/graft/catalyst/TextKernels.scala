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
      // mod applied per step: identical to (Σ h·w) mod M in exact arithmetic,
      // but overflow-free — each term is < 2^43 and acc stays < 2^30, so the
      // Long sum never wraps even for arbitrarily long documents (the oracle
      // computes the sum in HUGEINT, which a wrapped Long would diverge from).
      if (!tokens.isNullAt(i))
        acc = (acc + Md5Prefix40.hash(tokens.getUTF8String(i)) * ((i % 8) + 1)) % Mod
      i += 1
    }
    acc
  }
  def apply(c: Column): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(c)))
}

/** Word n-gram shingles — identical to the transform/sequence Column form
  * in `graft.functions.Dedup.shingles` (including the short-input edge:
  * fewer than n tokens produce one partial shingle, and nulls/absent
  * positions are skipped like `concat_ws`). */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  protected override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.Shingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val count = math.max(len - n, 0) + 1
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var o = 0
      while (o < n) {
        val idx = i + o
        parts(o) =
          if (idx < len && !tokens.isNullAt(idx)) tokens.getUTF8String(idx)
          else null // concatWs skips nulls, matching concat_ws semantics
        o += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(c), n))
}

/** Most-frequent-token mass ×1e6 (floor) — identical to the
  * sort-then-fold Column form it replaces in
  * `TextAnalysis.topTokenFractionMicros` (ArrayAggregate is
  * CodegenFallback; this stays in whole-stage codegen). Sorts a copy of
  * the token array and counts the longest equal run; the final division
  * is double-typed to mirror Catalyst's Divide exactly. */
case class TopTokenMass(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_token_mass_micros requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "top_token_mass_micros"

  protected override def nullSafeEval(input: Any): Any =
    TopTokenMass.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.TopTokenMass.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TopTokenMass =
    copy(child = newChild)
}

object TopTokenMass {
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val arr = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    var nonNull = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) { arr(nonNull) = tokens.getUTF8String(i); nonNull += 1 }
      i += 1
    }
    java.util.Arrays.sort(arr, 0, nonNull,
      new java.util.Comparator[org.apache.spark.unsafe.types.UTF8String] {
        def compare(a: org.apache.spark.unsafe.types.UTF8String,
                    b: org.apache.spark.unsafe.types.UTF8String): Int = a.compareTo(b)
      })
    // n > 0 here, so the fold's best is at least 1 (null tokens fold as
    // run-1 in the Column form this mirrors)
    var best = 1L
    var run = 1L
    i = 1
    while (i < nonNull) {
      if (arr(i).equals(arr(i - 1))) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    // mirror Catalyst Divide: both operands widened to double, then floor
    Math.floor((best * 1000000L).toDouble / math.max(n, 1).toDouble).toLong
  }
  def apply(c: Column): Column =
    ColumnBridge.column(TopTokenMass(ColumnBridge.expression(c)))
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

/** Top-k grams ranked by (count desc, gram asc) — the per-document
  * character-n-gram profile of a Cavnar–Trenkle language classifier
  * ("N-Gram-Based Text Categorization", 1994). One hash-map pass + one
  * sort of the DISTINCT grams (≪ input length); the composed Column form
  * (array_distinct + per-gram filter counts) is O(|distinct|·L) per row.
  * Output order is rank order: element i is the (i+1)-th most frequent
  * gram. Binary UTF8String comparison == DuckDB's default collation on
  * the [a-z ] alphabet the normalizer emits. */
case class TopGramsByCount(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_grams_by_count requires array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "top_grams_by_count"

  protected override def nullSafeEval(input: Any): Any =
    TopGramsByCount.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.TopGramsByCount.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TopGramsByCount =
    copy(child = newChild)
}

object TopGramsByCount {
  def compute(grams: ArrayData, k: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val n = grams.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](math.min(n * 2, 1 << 16))
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val g = grams.getUTF8String(i)
        val c = counts.get(g)
        counts.put(g, if (c == 0 && !counts.containsKey(g)) 1 else c + 1)
      }
      i += 1
    }
    val entries = new java.util.ArrayList[java.util.Map.Entry[UTF8String, Int]](
      counts.entrySet())
    java.util.Collections.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[UTF8String, Int]] {
        def compare(a: java.util.Map.Entry[UTF8String, Int],
                    b: java.util.Map.Entry[UTF8String, Int]): Int = {
          val byCount = Integer.compare(b.getValue, a.getValue)
          if (byCount != 0) byCount else a.getKey.compareTo(b.getKey)
        }
      })
    val m = math.min(k, entries.size)
    val out = new Array[Any](m)
    var j = 0
    while (j < m) { out(j) = entries.get(j).getKey; j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(TopGramsByCount(ColumnBridge.expression(c), k))
}

/** Cavnar–Trenkle verdict over a ranked doc profile: integer
  * out-of-place distance against each reference profile in ONE pass with
  * O(1) gram lookups (gram → per-language rank map built once per JVM
  * from the same `TextAnalysis.LangProfiles` constants the Column form
  * reads), argmin with seed-order tie-break, micros reject threshold.
  * Value-identical to the composed aggregate/zip_with/array_position
  * Column pipeline it replaces (FunctionsSpec pins the two paths) —
  * which is CodegenFallback and pays ~40 grams × 64-slot scans × 4
  * languages of interpreted lambda per ROW (measured 300 s for the
  * sf0.1 corpus vs ~1 s kernelized). */
case class LangIdVerdict(child: Expression, cutMicros: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"langid_verdict requires array<string>, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "langid_verdict"

  protected override def nullSafeEval(input: Any): Any =
    LangIdVerdict.compute(input.asInstanceOf[ArrayData], cutMicros)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.LangIdVerdict.compute($c, ${cutMicros}L)")

  override protected def withNewChildInternal(newChild: Expression): LangIdVerdict =
    copy(child = newChild)
}

object LangIdVerdict {
  import org.apache.spark.unsafe.types.UTF8String
  private lazy val langs: Array[UTF8String] =
    graft.functions.TextAnalysis.LangProfiles
      .map(p => UTF8String.fromString(p._1)).toArray
  private lazy val profileSize: Long =
    graft.functions.TextAnalysis.LangProfileSize.toLong
  private val Unknown = UTF8String.fromString("unknown")
  /** gram → 1-based rank per language (0 = absent). */
  private lazy val rankMap: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    val profs = graft.functions.TextAnalysis.LangProfiles
    profs.zipWithIndex.foreach { case ((_, ps), l) =>
      ps.zipWithIndex.foreach { case (g, i) =>
        val key = UTF8String.fromString(g)
        var ranks = m.get(key)
        if (ranks == null) { ranks = new Array[Int](profs.size); m.put(key, ranks) }
        ranks(l) = i + 1
      }
    }
    m
  }

  def compute(prof: ArrayData, cutMicros: Long): UTF8String = {
    val m = prof.numElements()
    if (m == 0) return Unknown
    val nl = langs.length
    val dist = new Array[Long](nl)
    var i = 0
    while (i < m) {
      val ranks = if (prof.isNullAt(i)) null else rankMap.get(prof.getUTF8String(i))
      var l = 0
      while (l < nl) {
        val r = if (ranks == null) 0 else ranks(l)
        dist(l) += (if (r == 0) profileSize else math.abs(r - (i + 1)).toLong)
        l += 1
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < nl) { if (dist(l) < dist(best)) best = l; l += 1 }
    val worst = m.toLong * profileSize
    if (dist(best) * 1000000L > worst * cutMicros) Unknown else langs(best)
  }
  def apply(c: Column, cutMicros: Long): Column =
    ColumnBridge.column(LangIdVerdict(ColumnBridge.expression(c), cutMicros))
}

/** Fused character-n-gram top-k profile straight from the normalized
  * string: gram extraction + counting + (count desc, gram asc) rank in
  * one pass — the transform(sequence, substr) + TopGramsByCount
  * composition walks interpreted ArrayTransform lambdas per position
  * (CodegenFallback), this stays inside codegen end to end.
  * Value-identical to the composition (FunctionsSpec pins it). */
case class CharNgramProfile(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngram_profile requires string, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngram_profile"

  protected override def nullSafeEval(input: Any): Any =
    CharNgramProfile.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.CharNgramProfile.compute($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): CharNgramProfile =
    copy(child = newChild)
}

object CharNgramProfile {
  import org.apache.spark.unsafe.types.UTF8String
  def compute(s: UTF8String, n: Int, k: Int): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](0))
    val counts = new java.util.HashMap[String, Int](256)
    var i = 0
    while (i <= len - n) {
      val g = str.substring(i, i + n)
      val c = counts.get(g)
      counts.put(g, if (counts.containsKey(g)) c + 1 else 1)
      i += 1
    }
    val entries = new java.util.ArrayList[java.util.Map.Entry[String, Int]](
      counts.entrySet())
    java.util.Collections.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[String, Int]] {
        def compare(a: java.util.Map.Entry[String, Int],
                    b: java.util.Map.Entry[String, Int]): Int = {
          val byCount = Integer.compare(b.getValue, a.getValue)
          if (byCount != 0) byCount else a.getKey.compareTo(b.getKey)
        }
      })
    val m = math.min(k, entries.size)
    val out = new Array[Any](m)
    var j = 0
    while (j < m) { out(j) = UTF8String.fromString(entries.get(j).getKey); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  def apply(c: Column, n: Int, k: Int): Column =
    ColumnBridge.column(CharNgramProfile(ColumnBridge.expression(c), n, k))
}

/** Fused decode-stub + dHash: pixel i = md5₄₀(token[i mod n]) % 256 over
  * the 9×7 grid, then the 56 MSB-first gradient bits — one pass, ≤ 63
  * token hashes per row, inside codegen. Value-identical to
  * `Multimodal.dHash(Multimodal.pixelGridStub(text))` (FunctionsSpec
  * pins it); that composition is nested CodegenFallback HOFs and
  * measured ~60 s per sf0.1 pass vs ~1 s fused. */
case class DHashStub(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash_stub requires array<string> (tokens), got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dhash_stub"

  protected override def nullSafeEval(input: Any): Any =
    DHashStub.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.DHashStub.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DHashStub =
    copy(child = newChild)
}

object DHashStub {
  // mirror Multimodal.DHashW/H — duplicated as plain ints to keep the
  // kernel free of an object-initialization cycle; pinned equal in spec
  private val W = 9
  private val H = 7
  private val Bits = (W - 1) * H

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    // split() never yields an empty array, but the kernel is public over
    // arbitrary array<string>: n = 0 would throw ArithmeticException on
    // i % n below. The composed Column path (i % size(toks) → null pixel
    // → every `when(p1 < p2)` bit 0) folds to 0L — match it exactly so
    // the kernel/reference equivalence holds on degenerate input too.
    if (n == 0) return 0L
    val px = new Array[Int](W * H)
    var i = 0
    while (i < W * H) {
      val t = i % n
      // element_at(toks, t+1) on a null slot hashes null → the Column
      // form yields null pixel; split() never emits nulls, so treat a
      // null defensively as hash 0 (cannot occur on real input)
      val h = if (tokens.isNullAt(t)) 0L
        else Md5Prefix40.hash(tokens.getUTF8String(t))
      px(i) = (h % 256L).toInt
      i += 1
    }
    ofGrid(px)
  }

  /** The MSB-first doubling fold over a W×H grid — shared by the text
    * stub above and the REAL-decode path (Multimodal.dhashFromPayload),
    * so both produce the same bit layout by construction. */
  def ofGrid(px: Array[Int]): Long = {
    var acc = 0L
    var b = Bits - 1
    while (b >= 0) {
      val r = b / (W - 1)
      val c = b % (W - 1)
      acc = acc * 2L + (if (px(r * W + c) < px(r * W + c + 1)) 1L else 0L)
      b -= 1
    }
    acc
  }
  def apply(c: Column): Column =
    ColumnBridge.column(DHashStub(ColumnBridge.expression(c)))
}
