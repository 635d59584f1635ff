package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-pattern substring counting — an Aho–Corasick
  * automaton (Aho & Corasick 1975) over a fixed term list, as one
  * codegen'd expression. The blocklist-screening primitive of a
  * curation pipeline: a 10k-term banned-list as chained `contains`/regex
  * kernels costs one scan PER TERM; the automaton pays ONE scan per
  * document regardless of list size (the list lives in the reference
  * object — data, not plan shape, the BpeEncode contract).
  *
  * Semantics: counts EVERY occurrence at every position, overlapping
  * included, both within a pattern ("aa" occurs twice in "aaa") and
  * across patterns (a position can end several patterns via the
  * fail-link chain). The oracle reproduces this by brute positional
  * enumeration — substr(text, i, len(kw)) = kw over all (i, kw) — which
  * is exactly the all-occurrences definition.
  *
  * Returns the per-term counts '|'-joined in the TERM LIST'S ORDER
  * (e.g. "2|0|1") — gate output carries the full count vector, not a
  * lossy total.
  *
  * Encoding caveat: the automaton steps UTF-16 code units while the
  * oracle's substr enumerates codepoints — identical on ASCII (this
  * corpus and any realistic blocklist); terms containing supplementary
  * characters would need a codepoint-stepping automaton first. */
case class MultiMatch(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty && terms.forall(_.nonEmpty),
    "multi_match needs a non-empty list of non-empty terms")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match requires a string column, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "multi_match"

  @transient private lazy val automaton = MultiMatch.build(terms.toArray)

  protected override def nullSafeEval(input: Any): Any =
    MultiMatch.run(input.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[MultiMatch.Automaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.catalyst.MultiMatch.run($c, $acRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatch =
    copy(child = newChild)
}

object MultiMatch {
  /** Flat-array Aho–Corasick automaton: per-state sparse goto maps, a
    * fail link, and the index list of terms ENDING at each state
    * (its own term plus everything reachable over fail links,
    * precomputed — matching never walks fail chains per position). */
  final class Automaton(
      val goto_ : Array[java.util.HashMap[Character, Integer]],
      val fail: Array[Int],
      val out: Array[Array[Int]],
      val nTerms: Int) extends Serializable

  def build(terms: Array[String]): Automaton = {
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    terms.zipWithIndex.foreach { case (t, ti) =>
      var s = 0
      t.foreach { ch =>
        val nxt = gotoMaps(s).get(ch)
        if (nxt == null) {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          ends += Nil
          gotoMaps(s).put(ch, gotoMaps.size - 1)
          s = gotoMaps.size - 1
        } else s = nxt.intValue()
      }
      ends(s) = ti :: ends(s)
    }
    val n = gotoMaps.size
    val fail = new Array[Int](n)
    val outSets = ends.map(_.toSet).toArray
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach((_, v) => { fail(v.intValue()) = 0; queue.add(v) })
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outSets(u) = outSets(u) ++ outSets(fail(u))
      gotoMaps(u).forEach { (ch, v) =>
        var f = fail(u)
        while (f != 0 && gotoMaps(f).get(ch) == null) f = fail(f)
        val fNext = gotoMaps(f).get(ch)
        fail(v.intValue()) =
          if (fNext != null && fNext.intValue() != v.intValue())
            fNext.intValue()
          else 0
        queue.add(v)
      }
    }
    new Automaton(gotoMaps.toArray, fail, outSets.map(_.toArray.sorted),
      terms.length)
  }

  def run(text: UTF8String, ac: Automaton): UTF8String = {
    val s = text.toString
    val counts = new Array[Long](ac.nTerms)
    var state = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      var nxt = ac.goto_(state).get(ch)
      while (nxt == null && state != 0) {
        state = ac.fail(state)
        nxt = ac.goto_(state).get(ch)
      }
      if (nxt != null) state = nxt.intValue()
      val out = ac.out(state)
      var k = 0
      while (k < out.length) { counts(out(k)) += 1; k += 1 }
      i += 1
    }
    UTF8String.fromString(counts.mkString("|"))
  }

  def apply(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MultiMatch(org.apache.spark.sql.graftbridge.ColumnBridge
        .expression(text), terms))
}
