package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Viterbi segmentation of a word against a unigram-LM piece vocabulary
  * (Kudo 2018, SentencePiece) — the OTHER major subword-tokenizer family
  * next to BPE ([[BpeEncode]]), as one codegen'd expression node.
  *
  * `pieces` maps each vocabulary piece to its EXACT-INTEGER score
  * (the caller quantizes log-probabilities to bits: s(p) = ⌊log2 f(p)⌋ −
  * ⌊log2 F⌋ — the q115/q264 `bin()` discipline, so the whole DP is
  * integer arithmetic, no libm, no float drift). The expression returns
  * the argmax segmentation joined with '|': the path maximizing Σ s(p),
  * tie-broken by FEWER pieces, then by the lexicographically smallest
  * segmentation string.
  *
  * Why a single best-per-position DP is exact under that tie order:
  * scores add, piece counts add, and two same-position prefixes with
  * equal (score, n_pieces) have segmentation strings of EQUAL length
  * (chars + separators), so neither is a proper prefix of the other and
  * lexicographic order is preserved under appending any common suffix.
  * An exhaustive-enumeration oracle (all compositions, not DP) verifies
  * this end-to-end in the q281/q282 gates.
  *
  * A word not coverable by the vocabulary returns the empty string —
  * callers that guarantee per-character coverage (all observed single
  * chars in the vocab) never see it and assert so in-query.
  *
  * Encoding caveat: the lexicographic tie-break compares Java UTF-16
  * code units while the oracle's binary collation compares UTF-8 bytes
  * — identical on ASCII (this corpus), divergent only on exact
  * score+count ties between segmentations differing in supplementary
  * characters. Non-ASCII corpora would pin a byte-order comparator
  * here first.
  *
  * Scale: like [[BpeEncode]], the vocabulary is a reference object the
  * generated code loops over — vocab size is data, not plan shape. Per
  * word the DP is O(len · maxPieceLen) map probes; callers apply it per
  * DISTINCT word (vocab-sized table), never per corpus token, and
  * broadcast the segmentation table back to the corpus.
  *
  * Reference frame: no counterpart in cascading-flink (its closest
  * text surface is RegexSplitter, `operation/regex/RegexSplitter` usage
  * in the platform tests); first-class LLM-pipeline extension
  * (SURVEY §2.28). */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Long)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires a string column, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "unigram_segment"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, s) => m.put(p, java.lang.Long.valueOf(s)) }
    m
  }
  @transient private lazy val maxLen: Int =
    if (pieces.isEmpty) 0 else pieces.iterator.map(_._1.length).max

  protected override def nullSafeEval(input: Any): Any =
    UnigramSegment.compute(input.asInstanceOf[UTF8String], table, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tabRef = ctx.addReferenceObj("unigramTab", table, "java.util.HashMap")
    val maxRef = maxLen.toString
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.catalyst.UnigramSegment.compute($c, $tabRef, $maxRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {
  /** Integer Viterbi over char positions; see the class doc for why the
    * single-best-per-position table is exact under the
    * (score DESC, n_pieces ASC, seg ASC) tie order. */
  def compute(word: UTF8String,
              tab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): UTF8String = {
    val w = word.toString
    val n = w.length
    if (n == 0) return UTF8String.EMPTY_UTF8
    val score = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val seg = new Array[String](n + 1)
    seg(0) = ""
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = if (maxPieceLen < i) maxPieceLen else i
      while (l <= lMax) {
        val j = i - l
        if (seg(j) != null) {
          val p = w.substring(j, i)
          val s = tab.get(p)
          if (s != null) {
            val cs = score(j) + s.longValue()
            val cn = np(j) + 1
            val cg = if (seg(j).isEmpty) p else seg(j) + "|" + p
            if (seg(i) == null || cs > score(i) ||
                (cs == score(i) && (cn < np(i) ||
                  (cn == np(i) && cg.compareTo(seg(i)) < 0)))) {
              score(i) = cs; np(i) = cn; seg(i) = cg
            }
          }
        }
        l += 1
      }
      i += 1
    }
    if (seg(n) == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(seg(n))
  }

  def apply(word: Column, pieces: Seq[(String, Long)]): Column =
    ColumnBridge.column(UnigramSegment(ColumnBridge.expression(word), pieces))
}
