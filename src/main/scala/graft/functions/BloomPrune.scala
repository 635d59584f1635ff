package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Pre-shuffle probe pruning with a Bloom filter — the semi-join shape at
  * 100 TB. A shuffled semi join moves EVERY probe-side row to the
  * exchange before the build side can reject it; when the build side is
  * selective (a filtered dimension, a contamination list, yesterday's
  * delta) almost all of those bytes are moved only to be dropped. Spark's
  * own runtime-filter rewrite (`InjectRuntimeFilter`) exists for exactly
  * this reason but fires on cost heuristics; this operator is the
  * EXPLICIT form a pipeline author can rely on: build a compact Bloom
  * sketch of the build-side keys, evaluate `might_contain` as a codegen'd
  * predicate INSIDE the probe scan (below the exchange), then run the
  * exact join over the survivors.
  *
  * Correctness is unconditional: the Bloom filter has false positives but
  * no false negatives, and every survivor still passes through the exact
  * semi join — the result is row-identical to the unpruned join, so the
  * sketch only ever REMOVES shuffle bytes, never changes the answer
  * (parity asserted in SkewAndHashSpec, oracle is the plain semi join).
  *
  * Scale shape: the sketch is built by one map-side-combined aggregation
  * over the build keys (partial sketches OR-merge associatively) and
  * carried to the driver as ONE row of `numBits/8` bytes — the same
  * O(sketch) driver carry as Lloyd centroids in [[Similarity]]; it
  * re-broadcasts into the probe scan as a foldable literal. Probe-side
  * cost is one xxhash64 + k bit-tests per row, fused into whole-stage
  * codegen. Size `numBits` ≈ 10 bits/key for ~1% FP: a 100M-key build
  * side is a 125 MB sketch, still broadcastable where an exact key set
  * is not.
  *
  * Reference anchor: the reference has no sketch pruning anywhere — its
  * HashJoin (`FlinkFlowStep.java` hash-join lowering) always materializes
  * the full streamed side; this operator is part of the engine's
  * 100 TB-first extension surface. */
object BloomPrune {

  /** One-row sketch of `key` over `build`: map-side partial Bloom filters,
    * OR-merged. `numBits` fixed (not estimated) so the sketch layout — and
    * therefore the pruned row set — is deterministic for a given key set. */
  def bloomOf(build: DataFrame, key: String, estItems: Long,
              numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(col(key)))),
      Literal(estItems), Literal(numBits)).toAggregateExpression()
    val row = build.select(ColumnBridge.column(agg)).head()
    require(!row.isNullAt(0), "bloom sketch of an empty build side")
    row.getAs[Array[Byte]](0)
  }

  /** `might_contain(sketch, xxhash64(key))` as a codegen'd probe predicate. */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Bloom-pruned LEFT SEMI join: result-identical to
    * `probe.join(build, probe(probeKey) === build(buildKey), "left_semi")`
    * with the probe side pre-filtered below its exchange. */
  def semiJoin(probe: DataFrame, build: DataFrame,
               probeKey: String, buildKey: String,
               estItems: Long, numBits: Long): DataFrame = {
    val sketch = bloomOf(build.select(col(buildKey)).distinct(), buildKey,
      estItems, numBits)
    probe.filter(mightContain(sketch, col(probeKey)))
      .join(build, probe(probeKey) === build(buildKey), "left_semi")
  }
}
