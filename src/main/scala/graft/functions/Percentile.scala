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
  * (for data with ≤6 decimal places — all TPC-H money/quantity columns —
  * quantization is lossless). Every arithmetic step (floor, double
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

  /** Micro-bucket a value: floor(x·1e6) as BIGINT — lossless for ≤6
    * decimal places, and the floor/cast pair behaves identically on Spark
    * and DuckDB (plain cast would truncate vs round). */
  def microBucket(x: Column): Column =
    floor(x.cast("double") * lit(1000000.0)).cast("long")

  /** Exact interpolated percentile `p` of `valueCol` per `groupCols`,
    * computed from micro-quantized buckets. Output: groupCols + `out`
    * (double). Nulls in `valueCol` are ignored (matching SQL percentile
    * semantics). */
  def microPercentile(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      p: Double, out: String): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentile fraction out of range: $p")
    val g = groupCols.map(col)
    // 1. distributed bucket counts (the scan-reducing aggregate)
    val buckets = df.filter(col(valueCol).isNotNull)
      .select(g :+ microBucket(col(valueCol)).as("__b"): _*)
      .groupBy((groupCols :+ "__b").map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    // 2. per-group CDF over the bucket relation
    val wOrd = Window.partitionBy(g: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    val cdf = buckets
      .withColumn("__cum", sum(col("__cnt")).over(wOrd))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      // 0-based target rank r = p·(n−1); bucket row covers ranks
      // [cum − cnt, cum − 1]
      .withColumn("__r", lit(p) * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__r")).cast("long"))
      .withColumn("__hi", ceil(col("__r")).cast("long"))
    // 3. keep only the covering buckets, interpolate
    val first = col("__cum") - col("__cnt")
    val last = col("__cum") - 1
    cdf.filter(col("__lo").between(first, last) || col("__hi").between(first, last))
      .groupBy(g: _*)
      .agg(
        max(when(col("__lo").between(col("__cum") - col("__cnt"), col("__cum") - 1),
          col("__b"))).as("__blo"),
        max(when(col("__hi").between(col("__cum") - col("__cnt"), col("__cum") - 1),
          col("__b"))).as("__bhi"),
        max(col("__r")).as("__rr"))
      .select(g :+
        ((col("__blo").cast("double") +
          (col("__rr") - floor(col("__rr"))) *
            (col("__bhi") - col("__blo")).cast("double")) / lit(1000000.0))
          .as(out): _*)
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
