package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for 100 TB-scale shuffles.
  *
  * AQE's skew-join splitting handles join-side skew at runtime; these
  * helpers cover the aggregation-side case (a handful of hot keys melting
  * one reducer) and explicit salted joins when AQE is unavailable.
  */
object Skew {

  /** Two-phase salted aggregation: repartition on (key, salt) so hot keys
    * spread over `saltBuckets` reducers, partially aggregate, then reduce
    * the salted partials. `partials` must be algebraic (re-aggregable):
    * e.g. count→sum, sum→sum, min→min, max→max.
    *
    * Phase profile: shuffle 1 on (key, salt) — uniform by construction;
    * shuffle 2 on key over `saltBuckets`× fewer rows. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partials: Seq[(String, Column)],
                      finals: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Salted count per key — the common hot-key histogram. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltBuckets: Int = 16,
                  as: String = "n"): DataFrame =
    saltedAggregate(df, keys, saltBuckets,
      partials = Seq("__pc" -> count(lit(1))),
      finals = Seq(as -> sum(col("__pc"))))

  /** Broadcast-salt a skewed join: replicate the small side `saltBuckets`×
    * with an added salt column, salt the big side's key randomly-but-
    * deterministically, and join on (key, salt). Spreads one hot key over
    * `saltBuckets` tasks. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, saltBuckets: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(bigKey), spark_partition_id(), monotonically_increasing_id()),
        lit(saltBuckets)))
    val saltedSmall = small.crossJoin(
      spark_explode_salts(small, saltBuckets))
    saltedBig.join(saltedSmall,
      saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig("__salt") === saltedSmall("__salt2"))
      .drop("__salt", "__salt2")
  }

  private def spark_explode_salts(df: DataFrame, n: Int): DataFrame =
    df.sparkSession.range(n).select(col("id").cast("int").as("__salt2"))
}
