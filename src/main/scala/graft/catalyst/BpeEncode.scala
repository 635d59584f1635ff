package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The whole BPE merge chain as ONE expression node: apply `subs` —
  * (pattern, replacement) literal pairs, already space-delimited by the
  * caller (char merges: " l r " → " lr "; word/phrase merges:
  * " l r " → " l_r ") — in rank order, each as an exhaustive
  * left-to-right literal replace over the symbol-spaced representation
  * (" s1 s2 ... sn ").
  *
  * This is the SCALE form of [[graft.functions.Vocab.bpeEncode]]'s
  * compiled replace chain: semantically bit-identical (JVM
  * `String.replace` and Spark's `UTF8String.replace` are both literal,
  * left-to-right, non-overlapping, continue-after-replacement — including
  * the documented self-pair behavior), but plan depth is CONSTANT in the
  * merge count. Nesting one Catalyst `replace` per merge stops analyzing
  * and codegenning around a few hundred merges (thousands of nested
  * expression nodes, deep generated-code call chains); a real tokenizer
  * has ~50k merges. Here the merge table is a single reference object the
  * generated code loops over — nMerges is data, not plan shape.
  *
  * Per-row cost is O(nMerges · len) with an O(len) `contains` early exit
  * per merge, so callers should apply it per DISTINCT word (the q155
  * distinct-trigram factoring), never per corpus token — see
  * [[graft.functions.Vocab.bpeEncodeAtScale]]. */
case class BpeEncode(child: Expression, subs: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires a string column, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_encode"

  @transient private lazy val pats = subs.map(_._1).toArray
  @transient private lazy val reps = subs.map(_._2).toArray

  protected override def nullSafeEval(input: Any): Any =
    BpeEncode.compute(input.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.catalyst.BpeEncode.compute($c, $patsRef, $repsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Rank-order exhaustive merge application over the spaced repr. */
  def compute(s: UTF8String, pats: Array[String], reps: Array[String]): UTF8String = {
    var str = s.toString
    var i = 0
    while (i < pats.length) {
      // contains() is the early exit that makes a 50k-merge vocab viable:
      // most merges touch nothing in a given (short) word
      if (str.contains(pats(i))) str = str.replace(pats(i), reps(i))
      i += 1
    }
    UTF8String.fromString(str)
  }

  def apply(spaced: Column, subs: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(spaced), subs))
}
