package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table access helpers for the driver test data (TESTDATA.md). */
object Tables {
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true` it
    * arrives as LongType nanos; normalize to a micros timestamp (matches
    * `CAST(ts AS TIMESTAMP)` from DuckDB's TIMESTAMP_NS). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        // integer div: ns values (~1.7e18) exceed double's 2^53 exact range
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
}
