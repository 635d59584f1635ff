package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bounded-heap per-group MIN-k (value, id) pairs —
  * `mink_pairs_agg(v, id, k)` returns the k lexicographically smallest
  * (v asc, id asc) pairs of the group as `array<struct<v:bigint,
  * id:bigint>>`, sorted ascending. The ranked-top-k companion of
  * [[TopKAgg]]: where TopKAgg returns bare values (callers re-join to
  * recover rows, gating value-tie freedom), this carries the row id
  * THROUGH the aggregate, so distance ties resolve deterministically by
  * id and the output array position IS the rank — no second pass, no
  * tie gate.
  *
  * The scale story vs the window form (`row_number() OVER (PARTITION BY
  * g ORDER BY v, id) <= k`): a window SORT-shuffles every group's full
  * row set; this aggregate keeps a k-element max-heap per group with
  * map-side partial aggregation, so the shuffle moves O(groups × k)
  * pairs instead of N rows — for an ADC scan, the difference between a
  * corpus-sized exchange and a per-query trickle.
  *
  * Both v and id must be BIGINT (exact integers end-to-end ⇒ ranks are
  * engine-portable); null v or id rows are skipped. k ≤ 1024. */
case class MinKPairsAgg(
    value: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKPairsAgg.PairHeap] {

  require(k > 0 && k <= 1024, s"mink_pairs_agg: k must be in 1..1024, got $k")

  override def children: Seq[Expression] = Seq(value, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MinKPairsAgg.PairType,
    containsNull = false)
  override def prettyName: String = "mink_pairs_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"mink_pairs_agg requires (bigint, bigint), got ($a, $b)")
    }

  override def createAggregationBuffer(): MinKPairsAgg.PairHeap =
    new MinKPairsAgg.PairHeap(k)

  override def update(buf: MinKPairsAgg.PairHeap,
                      input: InternalRow): MinKPairsAgg.PairHeap = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null)
      buf.offer(v.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: MinKPairsAgg.PairHeap,
                     b: MinKPairsAgg.PairHeap): MinKPairsAgg.PairHeap = {
    var i = 0
    while (i < b.size) { a.offer(b.vs(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buf: MinKPairsAgg.PairHeap): Any = {
    val (vs, ids) = buf.sortedAsc()
    val rows = new Array[Any](vs.length)
    var i = 0
    while (i < vs.length) {
      rows(i) = new GenericInternalRow(Array[Any](vs(i), ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MinKPairsAgg.PairHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.vs(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MinKPairsAgg.PairHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new MinKPairsAgg.PairHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKPairsAgg =
    copy(value = newChildren.head, id = newChildren(1))
}

object MinKPairsAgg {

  val PairType: StructType = StructType(Seq(
    StructField("v", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Fixed-capacity MAX-heap over (v, id) pairs under lexicographic
    * order: root = LARGEST retained pair, so a new pair either beats
    * (is smaller than) the root and replaces it, or is dropped in O(1).
    * Long comparisons only — no NaN hazards. Pairs are unique per group
    * when `id` is a row id, so the retained set (and the sorted output)
    * is deterministic regardless of partial-merge order. */
  final class PairHeap(cap: Int) {
    val vs = new Array[Long](cap)
    val ids = new Array[Long](cap)
    var size = 0

    // lex compare: (v, id) — true iff a > b
    @inline private def gt(av: Long, ai: Long, bv: Long, bi: Long): Boolean =
      av > bv || (av == bv && ai > bi)

    def offer(v: Long, id: Long): Unit = {
      if (size < cap) {
        vs(size) = v; ids(size) = id; size += 1
        var i = size - 1 // sift up (max-heap)
        while (i > 0 && gt(vs(i), ids(i), vs((i - 1) / 2), ids((i - 1) / 2))) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (gt(vs(0), ids(0), v, id)) {
        vs(0) = v; ids(0) = id // replace root, sift down
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = 2 * i + 2
          var m = i
          if (l < size && gt(vs(l), ids(l), vs(m), ids(m))) m = l
          if (r < size && gt(vs(r), ids(r), vs(m), ids(m))) m = r
          if (m == i) done = true else { swap(i, m); i = m }
        }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val tv = vs(i); vs(i) = vs(j); vs(j) = tv
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    }

    def sortedAsc(): (Array[Long], Array[Long]) = {
      val ix = Array.range(0, size).sortWith { (a, b) =>
        vs(a) < vs(b) || (vs(a) == vs(b) && ids(a) < ids(b))
      }
      (ix.map(vs), ix.map(ids))
    }
  }

  def apply(v: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      MinKPairsAgg(ColumnBridge.expression(v), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
