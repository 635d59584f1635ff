package graft.exec

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator
import scala.collection.concurrent.TrieMap

/** Counter facade — the engine's replacement for Cascading `FlowProcess`
  * counters. The reference maps Cascading counters onto Flink accumulators
  * and polls them over RPC every 10 s (`runtime/util/FlinkFlowProcess.java:121-146`,
  * `runtime/stats/AccumulatorCache.java:28-90`); Spark's `LongAccumulator`
  * + live driver reads make all of that machinery unnecessary.
  *
  * Counters registered here are driver-visible at any point during the job.
  * Executor closures must capture the `LongAccumulator` returned by
  * `counter()` — the accumulator is the serializable handle. The facade
  * itself is driver-only (it holds the SparkSession) and deliberately NOT
  * Serializable, so accidentally capturing it in a closure fails fast at
  * closure-cleaning time instead of with an empty registry on the executor.
  */
final class FlowCounters(spark: SparkSession) {
  private val registry = TrieMap.empty[(String, String), LongAccumulator]

  def counter(group: String, name: String): LongAccumulator =
    registry.getOrElseUpdate((group, name),
      spark.sparkContext.longAccumulator(s"$group.$name"))

  def value(group: String, name: String): Long =
    registry.get((group, name)).map(_.value.longValue).getOrElse(0L)

  def all: Map[(String, String), Long] =
    registry.view.mapValues(_.value.longValue).toMap
}
