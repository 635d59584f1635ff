package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole exact-bits Naive Bayes posterior as ONE expression node —
  * the kernel form of [[graft.functions.Classify.scoreNaiveBayes]]:
  * tokenize, look each token's per-class counts up in a reference-object
  * map, fold the quantized log-likelihoods, argmax with the
  * (score DESC, class ASC) tie order. Bit-identical to the join form by
  * construction (same ⌊log2⌋ integer arithmetic — the q283/q288 gates
  * share one oracle), but the PLAN collapses from two broadcasts + two
  * aggregations to a single scan-shaped projection: zero joins, zero
  * exchanges, and therefore STATELESS under structured streaming (the
  * q289 router). The model (O(V·classes) longs) rides the codegen
  * reference object — the BpeEncode/UnigramSegment carry contract.
  *
  * Returns "pred,best_bits,margin" (the caller splits — one compute per
  * row, three projected fields); empty/whitespace-only text returns
  * null (no tokens — the join form drops such docs; callers filter). */
case class NbScore(child: Expression,
                   classes: Seq[String],
                   priorBits: Seq[Long],
                   denomBits: Seq[Long],
                   wc: Map[String, Array[Long]])
    extends UnaryExpression {

  // the result packs as "pred,best_bits,margin" and callers split on ','
  // — a comma inside a class label would silently corrupt all three
  require(classes.forall(!_.contains(",")),
    s"nb_score: class labels must not contain ',' (got: " +
      s"${classes.filter(_.contains(",")).mkString("; ")})")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nb_score requires a string column, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "nb_score"

  @transient private lazy val clsArr: Array[String] = classes.toArray
  @transient private lazy val priorArr: Array[Long] = priorBits.toArray
  @transient private lazy val denomArr: Array[Long] = denomBits.toArray
  @transient private lazy val table: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]](wc.size * 2)
    wc.foreach { case (w, a) => m.put(w, a) }
    m
  }

  protected override def nullSafeEval(input: Any): Any =
    NbScore.compute(input.asInstanceOf[UTF8String],
      clsArr, priorArr, denomArr, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c1 = ctx.addReferenceObj("nbCls", clsArr, "java.lang.String[]")
    val c2 = ctx.addReferenceObj("nbPrior", priorArr, "long[]")
    val c3 = ctx.addReferenceObj("nbDenom", denomArr, "long[]")
    val c4 = ctx.addReferenceObj("nbWc", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.catalyst.NbScore.compute($c, $c1, $c2, $c3, $c4);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): NbScore =
    copy(child = newChild)
}

object NbScore {
  def compute(text: UTF8String, cls: Array[String], prior: Array[Long],
              denom: Array[Long],
              wc: java.util.HashMap[String, Array[Long]]): UTF8String = {
    val toks = text.toString.split(" ")
    val k = cls.length
    val score = new Array[Long](k)
    var c = 0
    while (c < k) { score(c) = prior(c); c += 1 }
    var any = false
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (w.nonEmpty) {
        any = true
        val counts = wc.get(w)
        c = 0
        while (c < k) {
          val n = if (counts == null) 0L else counts(c)
          // bits(n + 1) − denom(c); bits(1) = 0 is the unseen arm
          score(c) += (63 - java.lang.Long.numberOfLeadingZeros(n + 1)) - denom(c)
          c += 1
        }
      }
      i += 1
    }
    if (!any) return null
    // argmax, tie → smaller class name (cls is sorted ascending)
    var best = 0
    c = 1
    while (c < k) { if (score(c) > score(best)) best = c; c += 1 }
    // runner-up score (ties among runners-up share the margin value);
    // a single-class model has no runner-up — margin 0 by convention
    val margin = if (k == 1) 0L else {
      var second = if (best == 0) 1 else 0
      c = 0
      while (c < k) {
        if (c != best && score(c) > score(second)) second = c
        c += 1
      }
      score(best) - score(second)
    }
    UTF8String.fromString(cls(best) + "," + score(best) + "," + margin)
  }

  def apply(text: Column, classes: Seq[String], priorBits: Seq[Long],
            denomBits: Seq[Long], wc: Map[String, Array[Long]]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      NbScore(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        classes, priorBits, denomBits, wc))
}
