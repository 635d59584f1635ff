package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Misra–Gries frequent-items sketch — `misra_gries(item, k)` returns the
  * surviving candidate items of the group as an array of strings.
  *
  * State is HARD-BOUNDED at k counters per partial buffer no matter how
  * many distinct items stream through, and partial sketches merge
  * associatively (counter sum, then subtract the (k+1)-th largest counter
  * from all and keep the positive ones — Agarwal et al., "Mergeable
  * Summaries", PODS'12). The guarantee that survives any merge order:
  * every item with true frequency > N/(k+1) is present in the final
  * candidate set (its counter is undercounted by at most N/(k+1), so it
  * cannot reach zero). Which LOW-frequency items also survive IS
  * merge-order-dependent — so the sketch is a candidate generator, not an
  * answer: pair it with an exact counting pass restricted to the ≤ k
  * candidates (a broadcast semi-join — the second scan shuffles only
  * candidate rows) and the two-phase result is exact and deterministic.
  *
  * That two-phase shape is the 100 TB exact heavy-hitters plan: a naive
  * exact `GROUP BY token` shuffles every distinct token (billions of
  * keys); this shuffles O(partitions × k) sketch entries in phase 1 and
  * only the candidate-matching rows in phase 2.
  *
  * CAVEAT — Catalyst treats aggregates as deterministic and may re-execute
  * them (stage retry, subexpression reuse): two evaluations within one
  * query can disagree on the low-frequency survivors. Consume the sketch
  * ONCE (collect/head the candidate row, as q97 does) and never place raw
  * sketch output under a cross-engine or cross-run equality gate; the
  * ExpressionInfo usage text carries the same warning for SQL users.
  */
case class MisraGriesAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.Sketch] {

  require(k > 0 && k <= 65536, s"misra_gries: k must be in 1..65536, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "misra_gries"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires string, got $other")
  }

  override def createAggregationBuffer(): MisraGriesAgg.Sketch =
    new MisraGriesAgg.Sketch(k)

  override def update(buf: MisraGriesAgg.Sketch,
                      input: InternalRow): MisraGriesAgg.Sketch = {
    val v = child.eval(input)
    // UTF8String may point into a reused row buffer — materialize before
    // the sketch retains it
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: MisraGriesAgg.Sketch,
                     b: MisraGriesAgg.Sketch): MisraGriesAgg.Sketch = {
    a.mergeIn(b); a
  }

  override def eval(buf: MisraGriesAgg.Sketch): Any = {
    val items = buf.items()
    java.util.Arrays.sort(items.asInstanceOf[Array[AnyRef]]) // stable output
    new GenericArrayData(items.map(s => UTF8String.fromString(s): Any))
  }

  override def serialize(buf: MisraGriesAgg.Sketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    buf.counts.forEach { (item, n) =>
      // length-prefixed raw UTF-8 (writeUTF caps at 64 KB and would throw
      // on a long item — sketch items can be arbitrary strings)
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(n)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Sketch = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val s = new MisraGriesAgg.Sketch(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val c = in.readLong()
      s.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {

  /** Classic MG state: ≤ k counters. `offer` is amortized O(1) — the
    * decrement-all step pays one unit per previously-offered item. */
  final class Sketch(k: Int) {
    // java.lang.Long values: a scala.Long value type would silently unbox
    // absent-key null to 0L on get()
    val counts = new java.util.HashMap[String, java.lang.Long](k * 2)

    def offer(item: String): Unit = {
      val cur = counts.get(item)
      if (cur != null) counts.put(item, cur + 1L)
      else if (counts.size < k) counts.put(item, 1L)
      else decrementAll(1L)
    }

    /** Merge per Agarwal et al.: sum counters; if over capacity, subtract
      * the (k+1)-th largest counter value from every counter and drop the
      * non-positive — keeps the summary ≤ k entries with total undercount
      * still bounded by N/(k+1). */
    def mergeIn(other: Sketch): Unit = {
      other.counts.forEach { (item, n) =>
        val cur = counts.get(item)
        counts.put(item, if (cur == null) n else java.lang.Long.valueOf(cur + n))
      }
      if (counts.size > k) {
        val vals = new Array[Long](counts.size)
        var i = 0
        val it = counts.values().iterator()
        while (it.hasNext) { vals(i) = it.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val sub = vals(vals.length - k - 1) // (k+1)-th largest
        decrementAll(sub)
      }
    }

    private def decrementAll(by: Long): Unit = {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - by
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }

    def items(): Array[String] =
      counts.keySet().toArray(new Array[String](counts.size))
  }

  def apply(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
