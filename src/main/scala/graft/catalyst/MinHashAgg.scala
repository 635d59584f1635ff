package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Group-level MinHash: aggregates the k-component signature of the UNION
  * of all token sets in a group in one pass — `minhash_agg(tokens, k)`.
  *
  * min over the group's tokens = component-wise min over the group's
  * per-document minima, so the aggregation buffer is just the k running
  * minima (`Array[Long]`, 8k bytes): partial aggregation on the map side,
  * component-wise-min merge on reduce — the signature of a billion-document
  * cluster costs one scan plus a k-long buffer per group. This is the
  * `TypedImperativeAggregate` form of [[MinHashSig]] (same hash family,
  * same constants; a group of one document produces exactly
  * `minhash_sig(tokens, k)`).
  *
  * Use cases: cluster-level signatures for hierarchical dedup (compare
  * cluster sketches instead of member pairs), shard-level corpus sketches
  * for cross-shard near-dup estimation.
  */
case class MinHashAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_agg requires array<string>, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) MinHashAgg.fold(buf, v.asInstanceOf[ArrayData], k)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** No token anywhere in the group → null components (a token, once seen,
    * drives every component below MaxValue, so checking one suffices). */
  override def eval(buf: Array[Long]): Any =
    if (buf(0) == Long.MaxValue) new GenericArrayData(Array.fill[Any](k)(null))
    else new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  import MinHashSig.{P, aCoef, bCoef}

  /** Fold one token array into the running minima (shared with the per-row
    * kernel's inner loop: one md5 per token, k updates). */
  private[catalyst] def fold(mins: Array[Long], tokens: ArrayData, k: Int): Unit = {
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = Md5Prefix40.hash(tokens.getUTF8String(t)) % P
        var i = 0
        while (i < k) {
          val v = (h * aCoef(i) + bCoef(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
  }

  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
