package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Raw cosine similarity between two numeric arrays in ONE pass: the three
  * accumulators (dot, ‖a‖², ‖b‖²) fold left-to-right in array order, so the
  * result is bit-identical to the composed
  * `aggregate(zip_with(...))/sqrt·sqrt` Column pipeline it replaces — but
  * without three interpreted higher-order folds and two zipped intermediate
  * arrays per pair. Null elements or length mismatch yield null (matching
  * zip_with/aggregate null propagation). Rounding is intentionally left to
  * the caller (`round(_, 6)`) so Spark's own Round semantics apply. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(dt: DataType) = dt match {
    // long arrays: the micro-quantized centroid path (ivfKnnKMeans);
    // long->double widening is exact for |v| < 2^53
    case ArrayType(FloatType | DoubleType | LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double|bigint>, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // lazy: children are unresolved at construction time
  private def kindOf(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(LongType, _)  => 2
    case _                       => 1
  }
  private lazy val leftKind = kindOf(left.dataType)
  private lazy val rightKind = kindOf(right.dataType)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftKind, rightKind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val v = ctx.freshName("cos")
      s"""
         |Object $v = graft.catalyst.CosineSim.compute($a, $b, $leftKind, $rightKind);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $v).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Returns java.lang.Double or null (null elements / length mismatch).
    * kind: 0 = float, 1 = double, 2 = long elements. */
  def compute(a: ArrayData, b: ArrayData,
              aKind: Int, bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aKind == 0) a.getFloat(i).toDouble
              else if (aKind == 2) a.getLong(i).toDouble else a.getDouble(i)
      val y = if (bKind == 0) b.getFloat(i).toDouble
              else if (bKind == 2) b.getLong(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
