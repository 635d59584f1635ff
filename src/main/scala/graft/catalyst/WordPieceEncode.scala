package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Greedy longest-match-first WordPiece encoding of ONE WORD as a
  * codegen'd expression node (the [[BpeEncode]] discipline applied to
  * the WordPiece serving path — r15 advice: the mapPartitions closure
  * was correct and bounded, but a native expression keeps the whole
  * per-doc chain inside WholeStageCodegen and composes into streaming
  * projections with a plan the audits can read).
  *
  * Returns the word's PIECE COUNT as a long, or −1 when some position
  * has no matching vocabulary piece (the [UNK] word — callers map −1
  * to one piece + one unk). The walk is by CODEPOINTS
  * (offsetByCodePoints — the seeding regex and the DuckDB oracle both
  * count codepoints); pieces after the first position probe with the
  * "##" continuation prefix; the vocabulary is a single reference
  * object the generated code shares across rows (vocab size is data,
  * not plan shape). */
case class WordPieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_piece_encode requires a string column, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "word_piece_encode"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  // max piece length in CODEPOINTS (continuation '##' stripped)
  @transient private lazy val maxPiece: Int = vocab.iterator.map { p =>
    val body = if (p.startsWith("##")) p.substring(2) else p
    body.codePointCount(0, body.length)
  }.max

  protected override def nullSafeEval(input: Any): Any =
    WordPieceEncode.compute(input.asInstanceOf[UTF8String], vocabSet,
      maxPiece)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("wpVocab", vocabSet,
      "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.catalyst.WordPieceEncode.compute(" +
        s"$c, $vocabRef, $maxPiece);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceEncode = copy(child = newChild)
}

object WordPieceEncode {
  /** Greedy longest-match piece count, −1 on [UNK]. Byte-identical to
    * the former mapPartitions encodeWord loop (codepoint positions,
    * longest-first probing, '##' after the first piece). */
  def compute(word: UTF8String, vocab: java.util.HashSet[String],
              maxPiece: Int): Long = {
    val w = word.toString
    val wLen = w.codePointCount(0, w.length)
    var pos = 0    // codepoint position in the word
    var posIdx = 0 // its UTF-16 index
    var np = 0L
    while (pos < wLen) {
      var l = math.min(maxPiece, wLen - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        val endIdx = w.offsetByCodePoints(posIdx, l)
        val cand =
          if (pos == 0) w.substring(posIdx, endIdx)
          else "##" + w.substring(posIdx, endIdx)
        if (vocab.contains(cand)) found = l else l -= 1
      }
      if (found < 0) return -1L
      np += 1L
      posIdx = w.offsetByCodePoints(posIdx, found)
      pos += found
    }
    np
  }

  def apply(word: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieceEncode(ColumnBridge.expression(word), vocab))
}
