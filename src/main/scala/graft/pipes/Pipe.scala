package graft.pipes

import org.apache.spark.sql.types.DataType
import graft.model.{CFields, FieldSelector}
import graft.sources.Tap

/** Join semantics — the reference supports Inner/Left/Right/Outer/Mixed via
  * Cascading `Joiner`s expanded in `JoinClosure` (SURVEY.md §2.5). We lower
  * straight to Catalyst join types; unlike the reference's HashJoin
  * (inner/left only, `FlinkFlowStep.java:964-971`) all types work on both
  * join flavors. */
sealed trait Joiner { def sparkType: String }
object Joiner {
  case object Inner extends Joiner { val sparkType = "inner" }
  case object Left  extends Joiner { val sparkType = "left_outer" }
  case object Right extends Joiner { val sparkType = "right_outer" }
  case object Outer extends Joiner { val sparkType = "full_outer" }
  case object LeftSemi extends Joiner { val sparkType = "left_semi" }
  case object LeftAnti extends Joiner { val sparkType = "left_anti" }
}

/** Per-record op kinds hosted by an `Each` pipe. */
sealed trait EachOp
object EachOp {
  final case class Fn(fn: CFunction) extends EachOp
  final case class Gen(gen: CGenerator) extends EachOp
  final case class Flt(f: CFilter) extends EachOp
  final case class RowFn(f: CRowFunction) extends EachOp
}

/** Immutable pipe-assembly DSL — the Spark-native re-expression of the
  * Cascading programming model the reference executes (`Pipe`/`Each`/
  * `Every`/`GroupBy`/`CoGroup`/`HashJoin`/`Merge`; translator dispatch at
  * `FlinkFlowStep.java:202-351`). Pipes form a DAG; splits are plain object
  * reuse (the lowering memoizes, mirroring `flinkMemo` `FFS:230-242`).
  */
sealed trait Pipe {
  import FieldSelector._

  def each(fn: CFunction, args: FieldSelector = All,
           out: FieldSelector = Swap, trap: Option[Tap] = None): Pipe =
    EachPipe(this, EachOp.Fn(fn), args, out, trap)

  def generate(gen: CGenerator, args: FieldSelector,
               out: FieldSelector = Results, trap: Option[Tap] = None): Pipe =
    EachPipe(this, EachOp.Gen(gen), args, out, trap)

  def filterBy(f: CFilter, args: FieldSelector = All,
               trap: Option[Tap] = None): Pipe =
    EachPipe(this, EachOp.Flt(f), args, All, trap)

  /** Arbitrary 0..N row closure, optionally with a trap tap for failed rows
    * (reference traps: `runtime/each/EachStreamGraph.java:46`). */
  def eachRow(f: CRowFunction, args: FieldSelector = All,
              out: FieldSelector = Swap, trap: Option[Tap] = None): Pipe =
    EachPipe(this, EachOp.RowFn(f), args, out, trap)

  def groupBy(keys: String*): GroupByPipe =
    GroupByPipe(Seq(this), keys, Nil)

  def groupBySorted(keys: Seq[String], sort: Seq[(String, Boolean)],
                    reverse: Boolean = false): GroupByPipe =
    GroupByPipe(Seq(this), keys, sort, reverse)

  /** Global (key-less) grouping — reference forces dop-1
    * (`FFS:573-600`); Spark's partial+final aggregation has no such cliff. */
  def groupAll: GroupByPipe = GroupByPipe(Seq(this), Nil, Nil)

  /** `nullSafe = true` selects Cascading's null-key semantics: tuples with
    * null grouping keys GROUP TOGETHER and join each other (Cascading
    * compares tuple fields with null == null; the reference inherits that
    * through its Cascading comparators). The default (`false`) is ANSI SQL:
    * null keys never match, so outer joiners null-pad them. Both lower to
    * equi-join keys Catalyst plans as hash/sort-merge joins (`<=>` is an
    * `EqualNullSafe` equi-key — no nested-loop fallback). */
  def coGroup(leftKeys: Seq[String], right: Pipe, rightKeys: Seq[String],
              joiner: Joiner = Joiner.Inner,
              declared: Option[Seq[String]] = None,
              nullSafe: Boolean = false): Pipe =
    CoGroupPipe(this, leftKeys, right, rightKeys, joiner, declared, nullSafe)

  /** Broadcast join — reference `HashJoin` translates to
    * `BROADCAST_HASH_SECOND` (`FFS:993`); we hint `broadcast()` on the
    * right/small side and let Catalyst build the hash table. `nullSafe` as
    * in [[coGroup]]. */
  def hashJoin(leftKeys: Seq[String], right: Pipe, rightKeys: Seq[String],
               joiner: Joiner = Joiner.Inner,
               declared: Option[Seq[String]] = None,
               nullSafe: Boolean = false): Pipe =
    HashJoinPipe(this, leftKeys, right, rightKeys, joiner, declared, nullSafe)

  /** Key-less join = Cartesian. The reference's key-less joins broadcast
    * the tiny side (`crossWithTiny`, `FFS:765-800`); `tiny` marks which
    * side that is (default: right) so the plan is a
    * BroadcastNestedLoopJoin instead of a partitioned nested loop — at
    * scale, a big×small cross must replicate the SMALL side, never
    * shuffle the big one. `CrossSide.Neither` opts out (both sides huge:
    * an explicitly-planned partitioned cross). */
  def cross(right: Pipe, tiny: CrossSide = CrossSide.Right): Pipe =
    CrossPipe(this, right, tiny)

  /** Reduce-side cogroup with per-input iterators — reference `BufferJoin`
    * (spillable closure `CoGroupBufferClosure.java:41-418`); Spark's typed
    * cogroup spills internally so no custom spill code exists here. A trap
    * tap diverts FAILING KEY GROUPS (key values + error) instead of killing
    * the job — the reference wires traps through every stream graph
    * including the cogroup gates (`CoGroupBufferInGate.java:34-120`). With
    * a trap the group's output is forced eagerly, same trade as Buffer
    * traps. */
  def bufferJoin(leftKeys: Seq[String], right: Pipe, rightKeys: Seq[String],
                 resultFields: CFields,
                 buffer: (Seq[Any], Iterator[org.apache.spark.sql.Row],
                          Iterator[org.apache.spark.sql.Row]) => Iterator[Seq[Any]],
                 trap: Option[Tap] = None): Pipe =
    BufferJoinPipe(this, leftKeys, right, rightKeys, resultFields, buffer, trap)

  /** BufferJoin with DECLARED per-side value ordering — upstream CoGroup
    * with field comparators delivers each side's value iterator SORTED
    * (cascading SortedValuesPlatformTest.testCoGroupComparatorValues;
    * reference wires comparators through the serializer stack,
    * `types/tuple/TupleComparator.java`). Lowered to Spark's native
    * sorted cogroup: the ordering rides the shuffle's sort (one pass),
    * never a per-group in-memory sort. Sort spec per side:
    * (column, ascending). */
  def bufferJoinSorted(leftKeys: Seq[String], right: Pipe,
                       rightKeys: Seq[String],
                       leftSort: Seq[(String, Boolean)],
                       rightSort: Seq[(String, Boolean)],
                       resultFields: CFields,
                       buffer: (Seq[Any], Iterator[org.apache.spark.sql.Row],
                                Iterator[org.apache.spark.sql.Row]) =>
                               Iterator[Seq[Any]]): Pipe =
    BufferJoinSortedPipe(this, leftKeys, right, rightKeys, leftSort,
      rightSort, resultFields, buffer)

  /** n-way BufferJoin (3 or 4 inputs) — reference supports n-ary
    * `BufferJoin` via ordinal-tagged union (`FFS:802-851`); Spark's RDD
    * cogroup is natively 2–4-way. Trap semantics as in [[bufferJoin]]. */
  def bufferJoinN(leftKeys: Seq[String], others: Seq[(Pipe, Seq[String])],
                  resultFields: CFields,
                  fn: (Seq[Any], Seq[Iterator[org.apache.spark.sql.Row]]) =>
                      Iterator[Seq[Any]],
                  trap: Option[Tap] = None): Pipe =
    BufferJoinNPipe(this, leftKeys, others, resultFields, fn, trap)

  /** Union-all, positional, same arity — Cascading `Merge` (`FFS:652-673`). */
  def merge(others: Pipe*): Pipe = MergePipe(this +: others)

  /** Set intersection / difference (distinct semantics) — absent from the
    * reference (SURVEY.md §2.6); native in Spark. */
  def intersect(other: Pipe): Pipe = IntersectPipe(this, other)
  def except(other: Pipe): Pipe = ExceptPipe(this, other)

  /** AggregateBy-family sugar (CountBy/SumBy/AverageBy/MinBy/MaxBy —
    * SURVEY.md §2.4). Spark's partial aggregation provides the map-side
    * combine these assemblies exist for. */
  def countBy(keys: Seq[String], as: String = "count"): Pipe =
    GroupByPipe(Seq(this), keys, Nil).every(Aggs.count(as))
  def sumBy(keys: Seq[String], field: String, as: String): Pipe =
    GroupByPipe(Seq(this), keys, Nil).every(Aggs.sum(field, as))
  def averageBy(keys: Seq[String], field: String, as: String): Pipe =
    GroupByPipe(Seq(this), keys, Nil).every(Aggs.avg(field, as))
  /** Upstream-coercion variants — Cascading's SumBy/AverageBy read the
    * argument through `Tuples.toDouble(null) == 0`, so nulls contribute 0
    * AND count toward the average denominator, and an all-null group sums
    * to 0 rather than null (see [[Aggs.sumCoerced]]). */
  def sumByCoerced(keys: Seq[String], field: String, as: String): Pipe =
    GroupByPipe(Seq(this), keys, Nil).every(Aggs.sumCoerced(field, as))
  def averageByCoerced(keys: Seq[String], field: String, as: String): Pipe =
    GroupByPipe(Seq(this), keys, Nil).every(Aggs.avgCoerced(field, as))
  def minBy(keys: Seq[String], field: String, as: String): Pipe =
    GroupByPipe(Seq(this), keys, Nil).every(Aggs.min(field, as))
  def maxBy(keys: Seq[String], field: String, as: String): Pipe =
    GroupByPipe(Seq(this), keys, Nil).every(Aggs.max(field, as))

  def unique(fields: String*): Pipe =
    UniquePipe(this, if (fields.isEmpty) None else Some(fields))

  /** Cascading `Unique.Include.NO_NULLS`: tuples carrying a null in ANY of
    * the distinct fields are DISCARDED (not grouped as their own key —
    * that is plain `unique`, which keeps one null row). */
  def uniqueNoNulls(fields: String*): Pipe =
    UniquePipe(this, if (fields.isEmpty) None else Some(fields),
      UniqueInclude.NoNulls)

  def retain(fields: String*): Pipe = RetainPipe(this, fields)
  def discard(fields: String*): Pipe = DiscardPipe(this, fields)
  def rename(pairs: (String, String)*): Pipe = RenamePipe(this, pairs)
  def coerce(fields: (String, DataType)*): Pipe = CoercePipe(this, fields)

  /** Upstream-parity PRIMITIVE coercion: Cascading routes `Coerce`
    * through `cascading/tuple/coerce/Coercions.java`, which keeps TWO
    * coercers per numeric type — the object form (`Integer.class`,
    * null stays null) and the primitive form (`int.class`, null becomes
    * 0; `boolean.class` → false). [[coerce]] is the object form (SQL
    * cast); this is the primitive form: cast, then null-default. Only
    * GENUINE nulls take the 0/false default: the engine runs ANSI, so
    * an unparseable numeric STRING fails the flow (CAST_INVALID_INPUT
    * ≙ upstream Coercions' NumberFormatException — ConformanceSpec pins
    * the throw for the same input in both coerce and coercePrimitive). */
  def coercePrimitive(fields: (String, DataType)*): Pipe =
    CoercePrimitivePipe(this, fields)

  /** Global limit — the useful tightening of Cascading's per-slice `Limit`
    * (SURVEY.md §7.4), encoded in the oracle. Both semantics exist:
    * `limit` is a true global limit; [[sliceLimit]] is the per-slice
    * parity form. `sample` is per-slice Bernoulli on BOTH engines
    * (Cascading `Sample` and Spark `sample` each toss per row within a
    * slice), so one operator covers both there. */
  def limit(n: Long): Pipe = LimitPipe(this, n)

  /** Per-slice limit — Cascading `Limit` parity: each task slice emits at
    * most n rows (Spark's own LocalLimit node, no single-partition
    * gather; output count depends on partitioning, exactly like the
    * reference's per-slice behavior). */
  def sliceLimit(n: Long): Pipe = SliceLimitPipe(this, n)
  def sample(fraction: Double, seed: Long = 42L): Pipe =
    SamplePipe(this, fraction, seed)
  def orderBy(sort: (String, Boolean)*): Pipe = OrderByPipe(this, sort)

  /** Debug/assertion ops are strip-able at plan time in the reference
    * (`FlinkConnector.java:126-127`); `keepAssertions=false` in the lowering
    * drops these nodes. */
  def assertRows(sqlPredicate: String, message: String): Pipe =
    AssertPipe(this, sqlPredicate, message)

  /** Cascading `Debug`: prints schema and a row sample at lowering time,
    * stripped together with assertions. */
  def debug(prefix: String = "debug", n: Int = 5): Pipe =
    DebugPipe(this, prefix, n)

  /** Explicit materialization for multi-consumer splits where recomputation
    * would be costly (the DSL analogue of the reference's memoized
    * `flinkMemo` reuse, which Spark only gives within one action). */
  def persist(): Pipe = PersistPipe(this)

  /** Cascading `Checkpoint`: force an intermediate materialization point.
    * The reference supports checkpoint taps implicitly (it deletes their
    * data on REPLACE start, `planner/FlinkFlow.java:98`). With a tap, the
    * intermediate is written there at flow execution and downstream reads
    * the durable copy (restartable); without one, the plan lineage is
    * truncated via a lazy `localCheckpoint` (blocks live on executors). */
  def checkpoint(tap: Option[Tap] = None): Pipe = CheckpointPipe(this, tap)

  /** Per-pipe configuration — the analogue of Cascading `ConfigDef`
    * properties, which the reference propagates into each node's runtime
    * config (`FlinkConfigDefScheme.java:32-106` validates exactly this).
    * Properties apply to THIS pipe's subtree only: source taps in scope
    * receive them as reader options, and operations implementing
    * [[ConfigurableOp]] get `configure(props)` before lowering. Another
    * branch of the same flow sees none of them — taps and pipes may be
    * shared freely across scopes, but a ConfigurableOp INSTANCE belongs to
    * one scope (`configure` mutates it; the lowering fails fast if one
    * instance is reached from scopes with different properties).
    *
    * Layering follows Cascading's `ConfigDef.Mode` (the reference test
    * scheme asserts exactly this merge: process-level "default" survives
    * while node/tap-level values replace, `FlinkConfigDefScheme.java:
    * 55-66`): `withConfig` = Mode.REPLACE (inner scope wins over outer
    * scope and process properties), [[withConfigDefault]] = Mode.DEFAULT
    * (applies only where the key is NOT already set by an outer scope or
    * the process config), [[withConfigUpdate]] = Mode.UPDATE
    * (comma-appends to the outer value — Cascading's list-merge mode).
    * Process-level properties enter via `Flow.toDF(p, config)` /
    * `new Lowering(spark, processConfig = ...)`. */
  def withConfig(props: (String, String)*): Pipe =
    ConfigDefPipe(this, props.toMap, ConfigMode.Replace)

  /** Mode.DEFAULT layering: see [[withConfig]]. */
  def withConfigDefault(props: (String, String)*): Pipe =
    ConfigDefPipe(this, props.toMap, ConfigMode.Default)

  /** Mode.UPDATE layering: see [[withConfig]]. */
  def withConfigUpdate(props: (String, String)*): Pipe =
    ConfigDefPipe(this, props.toMap, ConfigMode.Update)
}

/** Cascading `ConfigDef.Mode` analogue — how a scope's properties merge
  * over the enclosing scope's (reference `FlinkConfigDefScheme.java`
  * asserts the REPLACE-over-process-default layering). */
sealed trait ConfigMode
object ConfigMode {
  /** Inner value wins (Cascading Mode.REPLACE — the common case). */
  case object Replace extends ConfigMode
  /** Set only where the key is absent in the enclosing scope/process
    * config (Cascading Mode.DEFAULT). */
  case object Default extends ConfigMode
  /** Comma-append to the enclosing value (Cascading Mode.UPDATE). */
  case object Update extends ConfigMode
}

final case class SourcePipe(tap: Tap, name: String = "source") extends Pipe

final case class EachPipe(prev: Pipe, op: EachOp, args: FieldSelector,
                          out: FieldSelector,
                          trap: Option[Tap] = None) extends Pipe

final case class GroupByPipe(inputs: Seq[Pipe], keys: Seq[String],
                             sort: Seq[(String, Boolean)],
                             reverse: Boolean = false) extends Pipe {
  /** `Every` + Aggregators — chained `every` calls collapse into one
    * Catalyst Aggregate (the reference chains them through one
    * `GroupByReducer` interpreter pass). */
  def every(aggs: AggOp*): AggregatePipe = AggregatePipe(this, aggs)
  /** `Every` + custom start/aggregate/complete aggregator. */
  def everyAgg(agg: CAggregator[_]): CustomAggPipe = CustomAggPipe(this, agg)
  /** Trapped `Every` + Aggregator: a group whose aggregator throws is
    * diverted to the trap tap (one row: key values + error) instead of
    * failing the job — the aggregation-level trap of the reference's
    * platform suite. Runs through the Buffer group-runner because trap
    * granularity is the WHOLE group, which rules out partial aggregation;
    * the reference's Every aggregators are reduce-side always
    * (`GroupByReducer`), so this matches its cost model, while the
    * untrapped [[everyAgg]] keeps Spark's partial aggregation as a strict
    * improvement. */
  def everyAgg(agg: CAggregator[_], trap: Option[Tap]): Pipe = trap match {
    case None => CustomAggPipe(this, agg)
    case Some(_) => BufferPipe(this, new AggAsBuffer(agg), trap = trap)
  }
  /** `Every` + Buffer: full group iterator in secondary-sort order. A trap
    * tap diverts groups whose buffer threw (reference traps cover the group
    * stream graphs too, not just Each). */
  def buffer(b: CBuffer, trap: Option[Tap] = None): BufferPipe =
    BufferPipe(this, b, trap = trap)
  /** Key-less ordered Buffer as a distributed prefix scan — the scale-safe
    * replacement for `groupAll.buffer` (which is inherently a single
    * sequential pass and is capped by the lowering). Only valid on a
    * key-less grouping. */
  def scan(sb: CScanBuffer[_]): ScanBufferPipe = {
    require(keys.isEmpty, "scan requires a key-less (global) grouping")
    ScanBufferPipe(this, sb)
  }
}

final case class AggregatePipe(grouped: GroupByPipe, aggs: Seq[AggOp]) extends Pipe {
  def every(more: AggOp*): AggregatePipe = AggregatePipe(grouped, aggs ++ more)
  /** Cascading `GroupAssertion` analogue: a per-group predicate checked
    * after aggregation. The predicate sees the group keys, every aggregate
    * result, and a synthetic `__group_size` count (so size assertions like
    * `AssertGroupSizeEquals` need no user-declared count aggregate; the
    * column is injected for the check and dropped from the output).
    * Stripped together with row assertions when the lowering runs with
    * `keepAssertions = false` — the analogue of the reference's
    * `ApplyAssertionLevelTransformer` plan-time strip
    * (`FlinkConnector.java:126-127`). */
  def assertGroup(sqlPredicate: String, message: String): Pipe =
    GroupAssertPipe(this, sqlPredicate, message)
}

final case class CustomAggPipe(grouped: GroupByPipe, agg: CAggregator[_]) extends Pipe

final case class BufferPipe(grouped: GroupByPipe, b: CBuffer,
                            includeKeys: Boolean = true,
                            trap: Option[Tap] = None) extends Pipe

final case class ScanBufferPipe(grouped: GroupByPipe, sb: CScanBuffer[_]) extends Pipe

final case class CoGroupPipe(left: Pipe, leftKeys: Seq[String], right: Pipe,
                             rightKeys: Seq[String], joiner: Joiner,
                             declared: Option[Seq[String]],
                             nullSafe: Boolean = false) extends Pipe

final case class HashJoinPipe(left: Pipe, leftKeys: Seq[String], right: Pipe,
                              rightKeys: Seq[String], joiner: Joiner,
                              declared: Option[Seq[String]],
                              nullSafe: Boolean = false) extends Pipe

/** Which side of a key-less cross is small enough to broadcast. */
/** Cascading `Unique.Include` — whether null-keyed tuples participate in
  * the distinct (`ALL`, one null row kept per key) or are dropped outright
  * (`NO_NULLS`). */
sealed trait UniqueInclude
object UniqueInclude {
  case object All extends UniqueInclude
  case object NoNulls extends UniqueInclude
}

sealed trait CrossSide
object CrossSide {
  case object Left extends CrossSide
  case object Right extends CrossSide
  case object Neither extends CrossSide
}

final case class CrossPipe(left: Pipe, right: Pipe,
                           tiny: CrossSide = CrossSide.Right) extends Pipe

final case class BufferJoinPipe(
    left: Pipe, leftKeys: Seq[String], right: Pipe, rightKeys: Seq[String],
    resultFields: CFields,
    b: (Seq[Any], Iterator[org.apache.spark.sql.Row],
        Iterator[org.apache.spark.sql.Row]) => Iterator[Seq[Any]],
    trap: Option[Tap] = None) extends Pipe

final case class BufferJoinSortedPipe(
    left: Pipe, leftKeys: Seq[String], right: Pipe, rightKeys: Seq[String],
    leftSort: Seq[(String, Boolean)], rightSort: Seq[(String, Boolean)],
    resultFields: CFields,
    b: (Seq[Any], Iterator[org.apache.spark.sql.Row],
        Iterator[org.apache.spark.sql.Row]) => Iterator[Seq[Any]]) extends Pipe

final case class BufferJoinNPipe(
    left: Pipe, leftKeys: Seq[String], others: Seq[(Pipe, Seq[String])],
    resultFields: CFields,
    fn: (Seq[Any], Seq[Iterator[org.apache.spark.sql.Row]]) =>
        Iterator[Seq[Any]],
    trap: Option[Tap] = None) extends Pipe

final case class ConfigDefPipe(prev: Pipe, props: Map[String, String],
                               mode: ConfigMode = ConfigMode.Replace) extends Pipe

final case class MergePipe(pipes: Seq[Pipe]) extends Pipe
final case class IntersectPipe(left: Pipe, right: Pipe) extends Pipe
final case class ExceptPipe(left: Pipe, right: Pipe) extends Pipe
final case class UniquePipe(prev: Pipe, fields: Option[Seq[String]],
                            include: UniqueInclude = UniqueInclude.All) extends Pipe
final case class RetainPipe(prev: Pipe, fields: Seq[String]) extends Pipe
final case class DiscardPipe(prev: Pipe, fields: Seq[String]) extends Pipe
final case class RenamePipe(prev: Pipe, pairs: Seq[(String, String)]) extends Pipe
final case class CoercePipe(prev: Pipe, fields: Seq[(String, DataType)]) extends Pipe
final case class CoercePrimitivePipe(prev: Pipe,
    fields: Seq[(String, DataType)]) extends Pipe
final case class LimitPipe(prev: Pipe, n: Long) extends Pipe
final case class SliceLimitPipe(prev: Pipe, n: Long) extends Pipe
final case class SamplePipe(prev: Pipe, fraction: Double, seed: Long) extends Pipe
final case class OrderByPipe(prev: Pipe, sort: Seq[(String, Boolean)]) extends Pipe
final case class AssertPipe(prev: Pipe, sqlPredicate: String,
                            message: String) extends Pipe
final case class GroupAssertPipe(agg: AggregatePipe, sqlPredicate: String,
                                 message: String) extends Pipe
final case class DebugPipe(prev: Pipe, prefix: String, n: Int) extends Pipe
final case class PersistPipe(prev: Pipe) extends Pipe
final case class CheckpointPipe(prev: Pipe, tap: Option[Tap]) extends Pipe

object Pipe {
  def source(tap: Tap, name: String = "source"): Pipe = SourcePipe(tap, name)
}
