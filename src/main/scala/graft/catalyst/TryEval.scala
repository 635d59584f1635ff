package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-row exception capture for trap semantics: evaluates `child` and
  * returns `struct(value, err)` — `err` null on success, the exception
  * rendered as a string on failure (and `value` null). This is what lets a
  * failing `ExpressionFunction`/`Filter`/`Generator` divert its input row to
  * a trap tap instead of killing the job, mirroring the reference's
  * per-stream trap handlers (`runtime/each/EachStreamGraph.java:46`,
  * `FlinkFlowProcess.java:169-190`).
  *
  * CodegenFallback is deliberate: the trap path is opt-in, exceptional-path
  * machinery; interpreting the wrapped expression per row costs far less
  * than the alternative (a row-closure rewrite of the whole operator), and
  * un-trapped operators are unaffected.
  */
case class TryEval(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("value", child.dataType, nullable = true),
    StructField("err", StringType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "try_eval"

  override def eval(input: InternalRow): Any =
    try InternalRow(child.eval(input), null)
    catch {
      case e: Exception =>
        InternalRow(null, UTF8String.fromString(
          e.getClass.getName + ": " + String.valueOf(e.getMessage)))
    }

  override protected def withNewChildInternal(newChild: Expression): TryEval =
    copy(child = newChild)
}

object TryEval {
  def apply(c: Column): Column =
    ColumnBridge.column(TryEval(ColumnBridge.expression(c)))
}
