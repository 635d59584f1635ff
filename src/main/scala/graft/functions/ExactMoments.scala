package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Domain guards for the exact integer co-moment pattern (q122): per-group
  * n, Σx, Σy, Σxy, Σx², Σy² over int64. The moments merge associatively
  * (the scale story vs double-folding `corr()`), but int64 accumulation is
  * only exact while `n · max|x·y|`, `n · max(x²)`, `n · max(y²)` all stay
  * inside 2^63 — so the input domain is CHECKED, not assumed, mirroring
  * ExactMicrosSum's micros-domain error. The headroom proof
  * (DesignRowsMax × bound² < Long.MaxValue) is pinned in ExactSumSpec.
  */
object ExactMoments {
  /** |x| bound: integral quantity domain (TPC-H l_quantity ≤ 50). */
  val XMax = 64L
  /** |y| bound in micros: micro-quantized rate ≤ 0.11 (l_discount ≤ 0.10
    * plus headroom). */
  val YMaxMicros = 110000L
  /** Largest per-group row count at the 100× design point (sf0.1 × 100 =
    * sf10 → largest l_returnflag group ≈ 3e7 rows; 1e8 adds 3× margin). */
  val DesignRowsMax = 100000000L

  /** Pass `c` through iff |c| ≤ bound, else raise a directed error naming
    * the violated bound — a silent int64 wrap in a moment column would
    * corrupt every derived statistic downstream. NULLs pass through (they
    * propagate through sum() exactly as ungated aggregation would; without
    * the isNull arm, abs(NULL) ≤ bound is NULL and a null value would
    * abort the query — with a NULL message, no less). Codegen'd branch on
    * the scan, no extra pass. */
  def guard(c: Column, bound: Long, name: String): Column =
    when(c.isNull || abs(c) <= bound, c).otherwise(raise_error(concat(
      lit(s"exact_moments: |$name| exceeds $bound, outside the int64 " +
        s"headroom proof (DesignRowsMax=$DesignRowsMax, see ExactSumSpec) " +
        "— re-derive the bounds or use decimal moments; value="),
      c.cast("string"))))

  def guardX(c: Column): Column = guard(c, XMax, "x")
  def guardY(c: Column): Column = guard(c, YMaxMicros, "y")

  /** Closed-form per-group OLS (y = a + b·x) in EXACT integer arithmetic:
    * the normal equations over decimal(38,0) moment sums,
    *   slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),
    *   intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²),
    * each ×10⁶ floor-quantized with the sign split out BEFORE the
    * integral division (Spark `div` truncates toward zero, DuckDB `//`
    * floors — identical on non-negative operands). `xCol`/`yCol` must
    * already be integer-valued columns; groups with constant x (den = 0)
    * are excluded — the coefficient is undefined there. One partial-agg
    * pass; decimal(38,0) holds every product while
    * max(n·Σ|x·y|, |Σy|·Σx²)·10⁶ < 10³⁸ — the second term is the
    * INTERCEPT numerator, which can overflow somewhat before the slope's
    * (round-11 advice); under ANSI an overflow fails loudly (a directed
    * decimal error), never silently wrong data. */
  def olsByGroup(df: org.apache.spark.sql.DataFrame,
                 groupCols: Seq[String], xCol: String,
                 yCol: String): org.apache.spark.sql.DataFrame = {
    val base = df.select(groupCols.map(col) ++ Seq(
      col(xCol).cast("decimal(38,0)").as("x"),
      col(yCol).cast("decimal(38,0)").as("y")): _*)
    base.groupBy(groupCols.map(col): _*).agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .filter(col("den") > 0)
      .select(groupCols.map(col) ++ Seq(
        col("n").cast("bigint").as("n"),
        expr("""CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END *
                (cast(abs(n * sxy - sx * sy) * 1000000 as decimal(38,0))
                 div den)""").cast("bigint").as("slope_micros"),
        expr("""CASE WHEN sy * sxx - sx * sxy < 0 THEN -1 ELSE 1 END *
                (cast(abs(sy * sxx - sx * sxy) * 1000000 as decimal(38,0))
                 div den)""").cast("bigint").as("intercept_micros")): _*)
  }
}
