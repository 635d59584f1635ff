package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bounded-heap per-group top-k — `topk_agg(value, k)` returns the k
  * largest values of the group, sorted descending (duplicates kept).
  *
  * The scale story vs the window form (`row_number() OVER (... ORDER BY v
  * DESC) <= k`): a window must SORT every group's full row set (shuffle +
  * per-partition sort of all N rows), while this aggregate keeps only a
  * k-element min-heap per group — partial aggregation on the map side
  * merges heaps, so the shuffle moves O(groups × k) values instead of N
  * rows, and nothing is ever sorted but the final k elements per group.
  * At 100 TB with small k this is the difference between a full-data sort
  * and a scan. The multiset of returned VALUES is deterministic even when
  * ties straddle the k boundary (which of several equal rows "wins" is
  * arbitrary in both forms, but the values are equal — so a value-only
  * result stays oracle-exact against a row_number window).
  *
  * Buffer: min-heap in an Array[Double] (k ≤ 1024 enforced); values must
  * be double-typed (cast upstream; exact for parquet doubles).
  */
case class TopKAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k > 0 && k <= 1024, s"topk_agg: k must be in 1..1024, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "topk_agg"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_agg requires double, got $other")
  }

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKAgg.Heap, b: TopKAgg.Heap): TopKAgg.Heap = {
    var i = 0
    while (i < b.size) { a.offer(b.values(i)); i += 1 }
    a
  }

  override def eval(buf: TopKAgg.Heap): Any =
    new GenericArrayData(buf.sortedDesc())

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)
}

object TopKAgg {

  /** Fixed-capacity min-heap over doubles: root = smallest retained value,
    * so a new value either beats the root (replace + sift) or is dropped
    * in O(1). All comparisons use `Double.compare` TOTAL ordering (NaN
    * greater than everything, matching both Spark's and DuckDB's sort
    * order) — IEEE `<`/`>` would let a NaN reach the root and then reject
    * every later value, silently poisoning the whole group's top-k. */
  final class Heap(cap: Int) {
    val values = new Array[Double](cap)
    var size = 0

    @inline private def lt(a: Double, b: Double): Boolean =
      java.lang.Double.compare(a, b) < 0

    def offer(v: Double): Unit = {
      if (size < cap) {
        values(size) = v; size += 1
        var i = size - 1 // sift up
        while (i > 0 && lt(values(i), values((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (lt(values(0), v)) {
        values(0) = v // replace root, sift down
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && lt(values(l), values(m))) m = l
          if (r < size && lt(values(r), values(m))) m = r
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val t = values(i); values(i) = values(j); values(j) = t
    }

    def sortedDesc(): Array[Double] = {
      val out = java.util.Arrays.copyOf(values, size)
      java.util.Arrays.sort(out) // total order: NaN sorts last (largest)
      var i = 0; var j = out.length - 1 // reverse in place
      while (i < j) { val t = out(i); out(i) = out(j); out(j) = t; i += 1; j -= 1 }
      out
    }
  }

  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
