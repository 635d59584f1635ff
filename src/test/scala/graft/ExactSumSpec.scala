package graft

import org.apache.spark.sql.functions._
import graft.catalyst.{ExactMicrosSum, Micros}

/** ExactMicrosSum must be BIT-IDENTICAL to the engine's decimal(38,6)
  * convention `cast(sum(cast(x as decimal(38,6))) as double)` — it replaces
  * that expression on the aggregation hot path (q01/q04/q06/q10/q15). */
class ExactSumSpec extends SparkSpec {
  import spark.implicits._

  private val decimalSum = "cast(sum(cast(x as decimal(38,6))) as double)"

  private def check(values: Seq[java.lang.Double]): Unit = {
    val df = values.toDF("x").cache()
    val expected = df.selectExpr(decimalSum).head.get(0)
    val got = df.agg(ExactMicrosSum.sum(col("x"))).head.get(0)
    df.unpersist()
    assert(got == expected, s"mismatch: got $got expected $expected for $values")
  }

  test("micros conversion matches Spark's double->decimal(38,6) cast exactly") {
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 1.0000005, -1.0000005, 2.0000015,
      0.0000005, -0.0000005, 0.0000004999999, 0.0000015, 123456789.123456,
      1e-7, -1e-7, 4.9e-7, 5.1e-7, 0.5e-6, 1.5e-6, 2.5e-6, 3.5e-6,
      9.19e12, -9.19e12, 3.14159265358979, 1.0 / 3.0, 2.0 / 3.0, 1e-300)
    adversarial.foreach { d =>
      val viaDecimal = Seq(d).toDF("x")
        .selectExpr("cast(cast(x as decimal(38,6)) * 1000000 as bigint)")
        .head.getLong(0)
      assert(Micros.compute(d) == viaDecimal, s"micros($d)")
    }
  }

  test("randomized parity with the decimal sum (mixed magnitudes and signs)") {
    val rnd = new scala.util.Random(42)
    val batches = Seq(
      Seq.fill(500)(java.lang.Double.valueOf(rnd.nextDouble() * 200000 - 100000)),
      Seq.fill(500)(java.lang.Double.valueOf((rnd.nextInt(2000000) - 1000000) / 2.0 * 1e-6)),
      Seq.fill(200)(java.lang.Double.valueOf(rnd.nextGaussian() * 1e9)),
      Seq.fill(200)(java.lang.Double.valueOf(rnd.nextGaussian() * 1e-5)))
    batches.foreach(check)
  }

  test("nulls skipped, all-null and empty groups are null") {
    check(Seq[java.lang.Double](1.5, null, 2.5, null))
    check(Seq[java.lang.Double](null, null))
    // NaN/Infinity: non-ANSI cast to decimal gives null -> skipped by sum
    val df = Seq(1.0, Double.NaN, 2.0, Double.PositiveInfinity).toDF("x")
    val expected = df.selectExpr(decimalSum).head.get(0)
    assert(df.agg(ExactMicrosSum.sum(col("x"))).head.get(0) == expected)
  }

  test("grouped + shuffled partials agree with decimal sums per group") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i =>
      (i % 7, rnd.nextDouble() * 10000 - 5000)).toDF("k", "x")
      .repartition(13).cache()
    val exp = df.groupBy("k").agg(expr(decimalSum).as("s"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    val got = df.groupBy("k").agg(ExactMicrosSum.sum(col("x")).as("s"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    df.unpersist()
    assert(got == exp)
  }

  test("values beyond the micros domain raise the documented error") {
    val df = Seq(1.0e13).toDF("x")
    val ex = intercept[Exception] {
      df.agg(ExactMicrosSum.sum(col("x"))).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    assert(chain(ex).contains("micros domain"))
  }

  test("plan stays in whole-stage codegen HashAggregate (no ObjectHashAggregate)") {
    val df = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val agg = df.groupBy("l_returnflag")
      .agg(ExactMicrosSum.sum(col("l_extendedprice")).as("s"))
    agg.collect() // materialize so AQE finalizes the physical plan
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("ObjectHashAggregate"))
    // the update loop must sit INSIDE a whole-stage codegen span
    // (the finalized plan marks codegen'd operators with a "*(n)" prefix)
    assert(plan.linesIterator.exists(l =>
      l.contains("HashAggregate") && l.contains("*(")))
  }

  test("works as a window aggregate, identical to the decimal running sum") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("i")
      .rowsBetween(Long.MinValue, 0)
    val rnd = new scala.util.Random(11)
    val df = (1 to 300).map(i => (i % 3, i, rnd.nextDouble() * 1000 - 500))
      .toDF("k", "i", "x").cache()
    val viaDecimal = df.withColumn("s",
        expr("sum(cast(x as decimal(38,6)))").over(w).cast("double"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.get(2), r.get(3))).toSet
    val viaKernel = df.withColumn("s", ExactMicrosSum.sum(col("x")).over(w))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.get(2), r.get(3))).toSet
    df.unpersist()
    assert(viaKernel == viaDecimal)
  }

  test("works as a SQL function via GraftExtensions") {
    graft.catalyst.GraftExtensions.register(spark)
    Seq((1, 1.25), (1, 2.5), (2, 0.0000005)).toDF("k", "x")
      .createOrReplaceTempView("xs")
    val got = spark.sql(
      "SELECT k, exact_sum_micros(x) AS s FROM xs GROUP BY k ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(got == Seq((1, 3.75), (2, 0.000001)))
  }

  test("exact co-moments: int64 headroom proof at the 100x design point") {
    // the q122 moment columns stay exact iff every per-group sum of the
    // largest products fits int64 — prove it from the CHECKED bounds, in
    // BigInt so the proof itself cannot overflow
    import graft.functions.ExactMoments._
    val worst = Seq(
      "sum_x2" -> BigInt(XMax) * XMax,
      "sum_y2" -> BigInt(YMaxMicros) * YMaxMicros,
      "sum_xy" -> BigInt(XMax) * YMaxMicros)
    for ((name, perRow) <- worst)
      assert(BigInt(DesignRowsMax) * perRow < BigInt(Long.MaxValue),
        s"$name: $DesignRowsMax rows x $perRow per row exceeds int64")
    // and the design row bound really covers 100x sf0.1: the largest
    // l_returnflag group scales to ~3e7 rows at sf10, 3x inside the bound
    val sf01Largest = spark.read.parquet(s"${sf("sf0.1")}/lineitem.parquet")
      .groupBy("l_returnflag").count().agg(max("count")).head().getLong(0)
    assert(sf01Largest * 100 <= DesignRowsMax,
      s"100x sf0.1 largest group ${sf01Largest * 100} exceeds DesignRowsMax")
  }

  test("exact co-moments: out-of-domain inputs raise the directed error") {
    import graft.functions.ExactMoments
    def chain(t: Throwable): String =
      if (t == null) "" else t.toString + chain(t.getCause)
    // y beyond the micro-rate domain (e.g. a rate column above 0.11)
    val exY = intercept[Exception] {
      Seq(200000L).toDF("y")
        .agg(sum(ExactMoments.guardY(col("y")) * ExactMoments.guardY(col("y"))))
        .collect()
    }
    assert(chain(exY).contains("exact_moments"))
    // x beyond the quantity domain
    val exX = intercept[Exception] {
      Seq(100L).toDF("x")
        .agg(sum(ExactMoments.guardX(col("x")))).collect()
    }
    assert(chain(exX).contains("exact_moments"))
    // in-domain values pass through unchanged
    val ok = Seq((3L, 100000L), (5L, -99999L)).toDF("x", "y")
      .agg(sum(ExactMoments.guardX(col("x")) * ExactMoments.guardY(col("y"))))
      .head().getLong(0)
    assert(ok == 3L * 100000L + 5L * -99999L)
    // NULLs pass through and aggregate exactly as ungated sums would
    // (abs(NULL) <= bound is NULL, so without the isNull arm a null value
    // would hit raise_error — with a NULL message)
    val withNulls = Seq(Some(3L), None, Some(5L)).toDF("x")
    assert(withNulls.agg(sum(ExactMoments.guardX(col("x"))))
      .head().getLong(0) == 8L)
    assert(withNulls.select(ExactMoments.guardX(col("x")).as("g"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      .toSet == Set(Some(3L), None, Some(5L)))
  }

  test("olsByGroup: hand-computed lines pin DIRECTION and the sign split") {
    import graft.functions.ExactMoments
    // the q242 lesson: a mirrored oracle pins arithmetic, not intent —
    // regression coefficients need a semantic fixture. Exact lines:
    //   group u (y = 2x):       slope +2e6,  intercept 0
    //   group d (y = 6 − 2x):   slope −2e6,  intercept +6e6 (sign split
    //     exercised: negative numerator, positive intercept)
    //   group c (x constant):   den = 0 → EXCLUDED
    val df = Seq(
      ("u", 1L, 2L), ("u", 2L, 4L), ("u", 3L, 6L),
      ("d", 1L, 4L), ("d", 2L, 2L), ("d", 3L, 0L),
      ("c", 5L, 1L), ("c", 5L, 9L)).toDF("g", "x", "y")
    val r = ExactMoments.olsByGroup(df, Seq("g"), "x", "y").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r == Map(
      "u" -> (3L, 2000000L, 0L),
      "d" -> (3L, -2000000L, 6000000L)))
    // non-exact fit floors: points (0,0),(1,1),(2,1) → slope 1/2,
    // intercept 1/6 → 500000 and 166666 micros
    val r2 = ExactMoments.olsByGroup(
      Seq(("a", 0L, 0L), ("a", 1L, 1L), ("a", 2L, 1L)).toDF("g", "x", "y"),
      Seq("g"), "x", "y").head()
    assert(r2.getLong(2) == 500000L && r2.getLong(3) == 166666L)
  }
}
