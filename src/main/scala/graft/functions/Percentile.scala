package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-safe exact interpolated percentiles.
  *
  * Spark's `percentile` aggregate holds one counter PER DISTINCT VALUE per
  * group inside a single aggregation buffer — on a near-continuous column a
  * big group's buffer grows with group size, an OOM hazard at 100 TB (one
  * `l_returnflag` group would hold ~10^11 distinct prices in one executor).
  *
  * This form pre-aggregates counts over micro-quantized fixed-point buckets
  * (`floor(x * 1e6)` as BIGINT) and interpolates from the bucket CDF:
  *
  *   1. bucket + count — an ordinary distributed hash aggregate: state is
  *      spread across ALL executors and bounded by the number of DISTINCT
  *      buckets (≤ value_range × 1e6, independent of row count), with
  *      map-side partial aggregation and spill — never one per-group
  *      in-memory map;
  *   2. per-group CDF via a window over the (small) bucket relation;
  *   3. the two buckets covering ranks floor(r)/ceil(r), r = p·(n−1),
  *      picked by filter + final agg; linear interpolation between them.
  *
  * The result is the exact interpolated percentile of the QUANTIZED values
  * (quantized on the double-representation micro grid — see
  * [[microBucket]] for the ≤1e-6 offset this implies). Every arithmetic
  * step (floor, double
  * multiply/subtract/divide) is IEEE-exact and engine-portable, so a DuckDB
  * oracle spelling the same steps hash-matches bit-for-bit (the q66 micros
  * discipline; `round()` is NOT used anywhere — its .5 behavior differs
  * across engines).
  *
  * Scale note: step 2's window puts one group's distinct buckets in one
  * partition — bounded by value range (e.g. ~10^7 rows of 16 bytes for
  * cent-priced data), not by data volume; step 1 is where the 100 TB of
  * rows are reduced, and it is a plain partial+final HashAggregate
  * (plan-asserted in PlanAuditSpec — no ObjectHashAggregate, no
  * per-value-map `percentile` buffer anywhere).
  */
object Percentile {

  /** Micro-bucket a value: floor(x·1e6) as BIGINT. The quantization grid
    * is that of the DOUBLE representation: a value stored slightly below
    * its decimal spelling (e.g. 0.29 ≈ 0.28999…) lands one bucket lower
    * than the literal would suggest, so the computed percentile can sit up
    * to 1e-6 below the unquantized interpolated value. Both engines apply
    * the identical IEEE floor/multiply, so the gate is exact regardless;
    * floor-then-cast (not plain cast) because Spark truncates where DuckDB
    * rounds. */
  def microBucket(x: Column): Column =
    floor(x.cast("double") * lit(1000000.0)).cast("long")

  /** One percentile spec: value column, fraction, output column name. */
  final case class Spec(valueCol: String, p: Double, out: String)

  /** Exact interpolated percentile `p` of `valueCol` per `groupCols`,
    * computed from micro-quantized buckets. Output: groupCols + `out`
    * (double). Nulls in `valueCol` are ignored (matching SQL percentile
    * semantics). */
  def microPercentile(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      p: Double, out: String): DataFrame =
    microPercentiles(df, groupCols, Seq(Spec(valueCol, p, out)))

  /** Several percentiles (possibly over DIFFERENT columns) in ONE corpus
    * scan: each row contributes one tagged bucket per spec
    * (`posexplode` of the per-spec bucket array), all counts aggregate in
    * a single partial+final HashAggregate (map-side combine absorbs the
    * 2–3× row expansion immediately), and one CDF/interpolation pass per
    * (group, spec) pivots back to one output row per group. At 100 TB the
    * scan dominates, so n percentiles cost ~1 scan + one shuffle of
    * bucket counts — not n of each (the two-scan-plus-join shape this
    * replaces). */
  def microPercentiles(df: DataFrame, groupCols: Seq[String],
                       specs: Seq[Spec]): DataFrame = {
    require(specs.nonEmpty, "no percentile specs")
    specs.foreach(s => require(s.p >= 0.0 && s.p <= 1.0,
      s"percentile fraction out of range: ${s.p}"))
    val g = groupCols.map(col)
    // 1. one scan: (group, which-spec, bucket) tagged rows → counted.
    // A null value contributes nothing for that spec (array entry null →
    // filtered), preserving per-spec SQL null semantics.
    val tagged = df
      .select(g :+ posexplode(array(specs.map(s =>
        microBucket(col(s.valueCol))): _*)).as(Seq("__w", "__b")): _*)
      .filter(col("__b").isNotNull)
    val buckets = tagged
      .groupBy((groupCols.map(col) :+ col("__w") :+ col("__b")): _*)
      .agg(count(lit(1)).as("__cnt"))
    // 2. CDF per (group, spec) over the bucket relation
    val part = g :+ col("__w")
    val wOrd = Window.partitionBy(part: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(part: _*)
    val pOfW = specs.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, (s, i)) => when(col("__w") === i, lit(s.p)).otherwise(acc)
    }
    val cdf = buckets
      .withColumn("__cum", sum(col("__cnt")).over(wOrd))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      // 0-based target rank r = p·(n−1); bucket row covers ranks
      // [cum − cnt, cum − 1]
      .withColumn("__r", pOfW * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__r")).cast("long"))
      .withColumn("__hi", ceil(col("__r")).cast("long"))
    // 3. keep only the covering buckets, interpolate per (group, spec)
    val first = col("__cum") - col("__cnt")
    val last = col("__cum") - 1
    val covering = cdf
      .filter(col("__lo").between(first, last) || col("__hi").between(first, last))
      .groupBy(part: _*)
      .agg(
        max(when(col("__lo").between(col("__cum") - col("__cnt"), col("__cum") - 1),
          col("__b"))).as("__blo"),
        max(when(col("__hi").between(col("__cum") - col("__cnt"), col("__cum") - 1),
          col("__b"))).as("__bhi"),
        max(col("__r")).as("__rr"))
      .withColumn("__val",
        (col("__blo").cast("double") +
          (col("__rr") - floor(col("__rr"))) *
            (col("__bhi") - col("__blo")).cast("double")) / lit(1000000.0))
    // 4. pivot the spec rows back to one row per group
    val outs = specs.zipWithIndex.map { case (s, i) =>
      max(when(col("__w") === i, col("__val"))).as(s.out)
    }
    covering.groupBy(g: _*).agg(outs.head, outs.tail: _*)
  }

  /** The DuckDB spelling of [[microPercentile]] — generated beside the
    * Spark form so the quantization/interpolation constants can never
    * drift. Returns a CTE chain (to splice after `WITH`) whose final CTE
    * `${prefix}res` has columns groupCols + `out`; prefixing lets several
    * percentiles compose in one statement. */
  def oracleCtes(prefix: String, table: String, groupCols: Seq[String],
                 valueExpr: String, p: Double, out: String): String = {
    val gs = groupCols.mkString(", ")
    s"""${prefix}bkt AS (
       |  SELECT $gs, CAST(floor(CAST($valueExpr AS DOUBLE) * 1000000) AS BIGINT) AS b,
       |         count(*) AS cnt
       |  FROM $table WHERE $valueExpr IS NOT NULL GROUP BY ALL),
       |${prefix}cdf AS (
       |  SELECT $gs, b, cnt,
       |  sum(cnt) OVER (PARTITION BY $gs ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum,
       |  sum(cnt) OVER (PARTITION BY $gs) AS n
       |  FROM ${prefix}bkt),
       |${prefix}ranked AS (
       |  SELECT *, CAST($p AS DOUBLE) * CAST(n - 1 AS DOUBLE) AS r FROM ${prefix}cdf),
       |${prefix}res AS (
       |  SELECT $gs,
       |  (CAST(max(CASE WHEN CAST(floor(r) AS BIGINT) BETWEEN cum - cnt AND cum - 1 THEN b END) AS DOUBLE)
       |   + (max(r) - floor(max(r))) *
       |     CAST(max(CASE WHEN CAST(ceil(r) AS BIGINT) BETWEEN cum - cnt AND cum - 1 THEN b END)
       |        - max(CASE WHEN CAST(floor(r) AS BIGINT) BETWEEN cum - cnt AND cum - 1 THEN b END) AS DOUBLE))
       |  / 1000000.0 AS $out
       |  FROM ${prefix}ranked
       |  WHERE CAST(floor(r) AS BIGINT) BETWEEN cum - cnt AND cum - 1
       |     OR CAST(ceil(r) AS BIGINT) BETWEEN cum - cnt AND cum - 1
       |  GROUP BY ALL)""".stripMargin
  }

  /** Standalone oracle statement for one percentile. */
  def oracleSql(table: String, groupCols: Seq[String], valueExpr: String,
                p: Double, out: String): String =
    s"""WITH ${oracleCtes("", table, groupCols, valueExpr, p, out)}
       |SELECT * FROM res""".stripMargin
}
