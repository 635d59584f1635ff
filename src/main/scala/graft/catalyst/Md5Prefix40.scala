package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 40-bit md5-prefix hash: value-identical to
  * `conv(substr(md5(s), 1, 10), 16, 10)` (the first 5 digest bytes,
  * big-endian) but without materializing the 32-char hex string and
  * re-parsing it per call. This is the hash kernel under every token-level
  * dedup/fingerprint operator (graft.functions.TextAnalysis.tokenHash), so
  * it runs once per token per scan — worth a real Catalyst expression with
  * codegen (stays inside WholeStageCodegen; no UDF serialization).
  */
case class Md5Prefix40(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix40 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix40"

  protected override def nullSafeEval(input: Any): Any =
    Md5Prefix40.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.catalyst.Md5Prefix40.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix40 =
    copy(child = newChild)
}

object Md5Prefix40 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 5 md5 digest bytes as an unsigned big-endian long (40 bits). */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }

  /** Column wrapper via the sql-package bridge. */
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      Md5Prefix40(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}
