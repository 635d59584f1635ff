package graft.pipes

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.CFields

/** Operation surface of the engine — the four Cascading interfaces the
  * reference hosts inside its Duct interpreters (SURVEY.md §2.9), rebuilt
  * Column-first so the common cases stay inside Catalyst codegen instead of
  * an interpreter loop (reference `runtime/each/EachMapper.java:98-137`).
  *
  * Preference order per the Spark mapping: declarative `Column` expressions
  * (codegen'd, pushdown-friendly) > typed lambdas > row closures.
  */

/** Operations that accept per-pipe configuration (Cascading `ConfigDef`
  * properties). The lowering calls `configure` with the merged properties of
  * the enclosing `withConfig` scopes before the operation is used — the
  * Spark-side analogue of the reference reading ConfigDef values out of the
  * node's runtime config (`FlinkConfigDefScheme.java:60-105`). */
trait ConfigurableOp {
  def configure(props: Map[String, String]): Unit
}

/** 1→1 per-row function: arg columns in, result columns out.
  * Reference: Cascading `Function` hosted in `EachMapper`. */
trait CFunction extends Serializable {
  def resultFields: CFields
  def apply(args: Seq[Column]): Seq[Column]
}

/** 1→N generator (e.g. RegexSplitGenerator): emits an array column that the
  * lowering explodes. Multi-field generators emit an array of structs. */
trait CGenerator extends Serializable {
  def resultFields: CFields
  /** Must return ArrayType(...) — one output row per element. */
  def apply(args: Seq[Column]): Column
}

/** Predicate; row kept when the column is true.
  * Reference: Cascading `Filter` in `EachMapper`. */
trait CFilter extends Serializable {
  def keep(args: Seq[Column]): Column
}

/** Arbitrary row-level 0..N closure — the escape hatch matching Cascading's
  * fully general `Function`. Non-codegen; use the Column forms when possible. */
trait CRowFunction extends Serializable {
  def resultFields: CFields
  def apply(args: Row): Iterator[Seq[Any]]
}

// ---------------------------------------------------------------------------
// Function library (Cascading operation.* equivalents, SURVEY.md §2.3)
// ---------------------------------------------------------------------------

/** `Identity` — pass-through with optional rename and coercion. */
final case class Identity(resultFields: CFields) extends CFunction {
  def apply(args: Seq[Column]): Seq[Column] =
    args.zip(resultFields.fields).map { case (c, (n, t)) =>
      (if (t == StringType) c else c.cast(t)).as(n)
    }
}

/** `Insert` — constant columns. */
final case class Insert(resultFields: CFields, values: Seq[Any]) extends CFunction {
  def apply(args: Seq[Column]): Seq[Column] =
    values.zip(resultFields.names).map { case (v, n) => lit(v).as(n) }
}

/** `RegexParser` — extract capture groups into result fields. */
final case class RegexParser(resultFields: CFields, pattern: String,
                             groups: Seq[Int]) extends CFunction {
  def apply(args: Seq[Column]): Seq[Column] =
    groups.zip(resultFields.fields).map { case (g, (n, t)) =>
      regexp_extract(args.head, pattern, g).cast(t).as(n)
    }
}

/** `RegexReplace`. */
final case class RegexReplace(field: String, pattern: String,
                              replacement: String) extends CFunction {
  val resultFields: CFields = CFields.of(field)
  def apply(args: Seq[Column]): Seq[Column] =
    Seq(regexp_replace(args.head, pattern, replacement).as(field))
}

/** `RegexSplitGenerator` — 1→N split (WordCount's tokenizer,
  * reference `example/WordCount.java:44-46`). */
final case class RegexSplitGenerator(field: String, pattern: String) extends CGenerator {
  val resultFields: CFields = CFields.of(field)
  def apply(args: Seq[Column]): Column =
    filter(split(args.head, pattern), c => length(c) > 0)
}

/** Cascading `UnGroup` — the inverse of an aggregation's row widening:
  * each input row pivots into one output row PER VALUE SELECTOR, every
  * output carrying the first `numKeys` argument columns plus that
  * selector's columns (cascading.operation.function.UnGroup semantics;
  * surfaced by the platform suite's FieldedPipesPlatformTest.testUnGroup).
  * Selectors are positional indices into the argument columns and must all
  * have the same arity; `resultFields` declares `numKeys + arity` names.
  * Lowers to one array<struct> literal + explode — a codegen'd scan-only
  * plan (rows ×selectors with no shuffle, safe at any scale). */
final case class UnGroup(resultFields: CFields, numKeys: Int,
                         valueSelectors: Seq[Seq[Int]]) extends CGenerator {
  require(valueSelectors.nonEmpty && valueSelectors.map(_.size).distinct.size == 1,
    "UnGroup value selectors must be non-empty and same-arity")
  require(resultFields.names.size == numKeys + valueSelectors.head.size,
    "UnGroup declares numKeys + selector-arity result fields")
  def apply(args: Seq[Column]): Column = {
    val names = resultFields.names
    array(valueSelectors.map { sel =>
      val cols = args.take(numKeys) ++ sel.map(args)
      struct(cols.zip(names).map { case (c, n) => c.as(n) }: _*)
    }: _*)
  }
}

object UnGroup {
  /** Cascading's size-based constructor (`UnGroup(declared, groupSelector,
    * size)`, pinned by RegressionPipesPlatformTest.testUnGroupBySize): the
    * `numValues` value arguments are chunked into consecutive groups of
    * `groupSize`, one output row per chunk. Pure sugar over the selector
    * form — same scan-only explode plan. */
  def bySize(resultFields: CFields, numKeys: Int, numValues: Int,
             groupSize: Int): UnGroup = {
    require(groupSize > 0 && numValues > 0 && numValues % groupSize == 0,
      s"UnGroup.bySize: $numValues value fields not divisible into chunks of $groupSize")
    UnGroup(resultFields, numKeys,
      (numKeys until numKeys + numValues).grouped(groupSize).map(_.toSeq).toSeq)
  }
}

/** `RegexFilter` — keep rows matching (or not matching) the pattern. */
final case class RegexFilter(pattern: String, removeMatch: Boolean = false) extends CFilter {
  def keep(args: Seq[Column]): Column =
    if (removeMatch) !args.head.rlike(pattern) else args.head.rlike(pattern)
}

/** `ExpressionFunction` — the reference compiles Janino Java expressions
  * (`cascading-expression`, pom.xml:134-138); Catalyst SQL expressions are
  * the exact analogue and additionally optimize/pushdown. */
final case class ExpressionFunction(field: String, sqlExpr: String,
                                    dataType: DataType = StringType) extends CFunction {
  val resultFields: CFields = CFields.typed(field -> dataType)
  def apply(args: Seq[Column]): Seq[Column] =
    Seq(expr(sqlExpr).cast(dataType).as(field))
}

/** `ExpressionFilter`. */
final case class ExpressionFilter(sqlExpr: String, removeMatch: Boolean = true) extends CFilter {
  // Cascading ExpressionFilter REMOVES rows where the expression is true.
  def keep(args: Seq[Column]): Column =
    if (removeMatch) !expr(sqlExpr) else expr(sqlExpr)
}

/** `DateParser` — string → timestamp. */
final case class DateParser(field: String, format: String) extends CFunction {
  val resultFields: CFields = CFields.typed(field -> TimestampType)
  def apply(args: Seq[Column]): Seq[Column] =
    Seq(to_timestamp(args.head, format).as(field))
}

/** `DateFormatter` — timestamp → string. */
final case class DateFormatter(field: String, format: String) extends CFunction {
  val resultFields: CFields = CFields.of(field)
  def apply(args: Seq[Column]): Seq[Column] =
    Seq(date_format(args.head, format).as(field))
}

/** `FieldFormatter` — printf over the argument fields. */
final case class FieldFormatter(field: String, format: String) extends CFunction {
  val resultFields: CFields = CFields.of(field)
  def apply(args: Seq[Column]): Seq[Column] =
    Seq(format_string(format, args: _*).as(field))
}

/** `FieldJoiner` — concat args with a delimiter. */
final case class FieldJoiner(field: String, delimiter: String) extends CFunction {
  val resultFields: CFields = CFields.of(field)
  def apply(args: Seq[Column]): Seq[Column] =
    Seq(concat_ws(delimiter, args: _*).as(field))
}

/** General column filter from a SQL boolean string. */
final case class SqlFilter(sql: String) extends CFilter {
  def keep(args: Seq[Column]): Column = expr(sql)
}

/** Logical filter combinators — Cascading `operation.filter.{And,Or,Not,Xor}`.
  * Children see the same argument columns, matching Cascading's shared
  * argument selector semantics.
  *
  * The upstream combinators compose `isRemove`, NOT keep: `And` REMOVES a
  * tuple iff ALL children would remove it (keep = OR of keeps), `Or`
  * removes iff ANY child removes (keep = AND of keeps), `Xor` removes iff
  * exactly one child removes (keep = keeps equal). Counter-intuitive but
  * contractual — this port originally composed keep directly (swapping
  * And/Or and inverting Xor), caught by the Logic conformance corner. */
final case class AndFilter(filters: CFilter*) extends CFilter {
  def keep(args: Seq[Column]): Column = filters.map(_.keep(args)).reduce(_ || _)
}
final case class OrFilter(filters: CFilter*) extends CFilter {
  def keep(args: Seq[Column]): Column = filters.map(_.keep(args)).reduce(_ && _)
}
final case class NotFilter(f: CFilter) extends CFilter {
  def keep(args: Seq[Column]): Column = !f.keep(args)
}
final case class XorFilter(a: CFilter, b: CFilter) extends CFilter {
  def keep(args: Seq[Column]): Column = a.keep(args) === b.keep(args)
}

// ---------------------------------------------------------------------------
// Aggregators (Cascading `Every` + Aggregator / AggregateBy, SURVEY.md §2.4)
// ---------------------------------------------------------------------------

/** A named aggregate — lowered to `df.groupBy(...).agg(col)`. Spark performs
  * map-side partial aggregation automatically, which subsumes the whole
  * reference `AggregateBy` machinery (partial functor in EachMapper + final
  * in GroupByReducer). */
final case class AggOp(resultField: String, make: Seq[Column] => Column,
                       argFields: Seq[String])

object Aggs {
  def count(as: String = "count"): AggOp =
    AggOp(as, _ => org.apache.spark.sql.functions.count(lit(1)), Nil)
  def countArg(field: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.count(a.head), Seq(field))
  def sum(field: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.sum(a.head), Seq(field))
  def avg(field: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.avg(a.head), Seq(field))
  /** Cascading null-coercion semantics for Sum/Average: the upstream
    * aggregators read arguments through `Tuples.toDouble`, which coerces
    * null to 0 but still COUNTS the tuple (cascading-core
    * `tuple/Tuples.java`, `operation/aggregator/Sum.java`/`Average.java`).
    * SQL sum/avg ignore nulls instead — same sum over mixed groups, but an
    * all-null group sums to null (upstream: 0) and avg divides by the
    * non-null count (upstream: ALL rows). These variants pin the upstream
    * semantics; plain [[sum]]/[[avg]] keep the SQL semantics. */
  def sumCoerced(field: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.sum(coalesce(a.head, lit(0))),
      Seq(field))
  def avgCoerced(field: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.avg(coalesce(a.head, lit(0))),
      Seq(field))
  def min(field: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.min(a.head), Seq(field))
  def max(field: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.max(a.head), Seq(field))
  /** `First`/`Last` over the secondary-sort order: deterministic via
    * min_by/max_by on the sort key rather than partition order. */
  def firstBy(field: String, orderField: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.min_by(a.head, a(1)),
      Seq(field, orderField))
  def lastBy(field: String, orderField: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.max_by(a.head, a(1)),
      Seq(field, orderField))
  def countDistinct(field: String, as: String): AggOp =
    AggOp(as, a => org.apache.spark.sql.functions.count_distinct(a.head), Seq(field))
  def approxCountDistinct(field: String, as: String): AggOp =
    AggOp(as, a => approx_count_distinct(a.head), Seq(field))
  /** Raw escape hatch: any Catalyst aggregate expression. */
  def sql(as: String, aggExpr: String): AggOp =
    AggOp(as, _ => expr(aggExpr), Nil)
  /** Raw escape hatch: a pre-built aggregate Column (e.g. a native
    * aggregate expression that has no SQL-registry name in this session). */
  def agg(as: String, c: org.apache.spark.sql.Column): AggOp =
    AggOp(as, _ => c, Nil)
}

/** Cascading-style start/aggregate/complete custom aggregator
  * (reference hosts these in `GroupByReducer.java:102-131`). Adapted to a
  * Spark `Aggregator[Row, B, Any]` by the lowering. */
trait CAggregator[B] extends Serializable {
  def resultField: String
  def resultType: DataType
  def start: B
  def aggregate(buf: B, args: Seq[Any]): B
  def merge(a: B, b: B): B
  def complete(buf: B): Any
  def argFields: Seq[String]
  /** Encoder for the aggregation buffer. The default is kryo — works for
    * any `B` but pays generic serialization on every partial-buffer
    * exchange. Override with a typed encoder (e.g.
    * `Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)`) to keep
    * partial buffers in Tungsten rows; measured ~4× on the q53 gate query. */
  def bufferEncoder: org.apache.spark.sql.Encoder[B] =
    org.apache.spark.sql.Encoders.kryo[B](
      scala.reflect.ClassTag.Any.asInstanceOf[scala.reflect.ClassTag[B]])
}

/** Adapter running a [[CAggregator]] under the Buffer group-runner — the
  * trapped-aggregation path (see `GroupByPipe.everyAgg(agg, trap)`): folds
  * the group through start/aggregate/complete sequentially so a throw can
  * divert the whole group to the trap. `merge` is unused here (single
  * sequential fold per group). */
final class AggAsBuffer(agg: CAggregator[_]) extends CBuffer {
  private val a = agg.asInstanceOf[CAggregator[Any]]
  def resultFields: CFields = CFields.typed(a.resultField -> a.resultType)
  def operate(key: Seq[Any], rows: Iterator[Row]): Iterator[Seq[Any]] = {
    var b = a.start
    rows.foreach(r => b = a.aggregate(b, a.argFields.map(f => r.getAs[Any](f))))
    Iterator.single(Seq(a.complete(b)))
  }
}

/** Per-group iterator → 0..N rows, values in secondary-sort order —
  * Cascading `Buffer` (reference `GroupByInGate.java:87-115` provides the
  * sorted group iterator). Lowered via the repartition + sortWithinPartitions
  * + mapPartitions group-runner so intra-group order is guaranteed. */
trait CBuffer extends Serializable {
  def resultFields: CFields
  /** @param key   the group key values (in groupFields order)
    * @param rows  the group's rows in secondary-sort order */
  def operate(key: Seq[Any], rows: Iterator[Row]): Iterator[Seq[Any]]
}

/** Distributed key-less (global-group) ordered Buffer — the scale-safe form
  * of `groupAll.buffer(...)`, which the reference runs at dop-1
  * (`FFS:573-600`, the cliff SURVEY §7.4 says not to replicate).
  *
  * Semantics: rows are totally ordered by the group's sort fields; output is
  * what a single sequential pass with running state `S` would produce. The
  * lowering executes it as a two-phase prefix scan:
  *   1. range-partitioned parallel sort; each partition folds its rows into
  *      a summary state via `observe` (tiny: one `S` per partition);
  *   2. summaries are prefix-`merge`d in range order, each partition's
  *      carry-in is broadcast, and `emit` runs per partition in parallel.
  * Requires `merge` to be associative over adjacent ranges — true for any
  * running aggregate (sums, counts, last-value, min/max, …). `S` must be
  * java-serializable (it travels driver↔executor once per partition). */
trait CScanBuffer[S] extends Serializable {
  def resultFields: CFields
  def zero: S
  /** Fold one row (in sort order) into the range summary — phase 1. */
  def observe(state: S, row: Row): S
  /** Merge two adjacent ranges' summaries, left range first. */
  def merge(left: S, right: S): S
  /** Emit output rows for one range given the merged state of every
    * preceding range — phase 2, runs in parallel per range. */
  def emit(carryIn: S, rows: Iterator[Row]): Iterator[Seq[Any]]
}
