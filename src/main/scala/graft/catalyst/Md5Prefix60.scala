package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5-prefix hash — the WIDE companion of [[Md5Prefix40]]:
  * value-identical to `conv(substr(md5(s), 1, 15), 16, 10)` (the first 15
  * hex nibbles = 60 big-endian bits of the digest). 40 bits hits its
  * birthday bound near 2^20 distinct keys — fine for per-document token
  * work, marginal for corpus-wide n-gram tables. 60 bits pushes the 50%
  * collision point to ~2^30 distinct grams while still fitting a signed
  * int64 (no unsigned headaches in either engine); substring-dedup keying
  * at the 100 TB tier should use this form (a residual collision
  * manufactures a false dup span, so the bound is the operator's
  * correctness knob, not just a perf knob).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  protected override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of the md5 digest (7.5 bytes, big-endian): the first 8
    * digest bytes as an unsigned long, logically right-shifted 4 — the
    * same value as parsing the first 15 hex chars. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top8 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top8 >>> 4
  }

  /** Column wrapper via the sql-package bridge. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      Md5Prefix60(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}
