package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table access helpers for the driver test data (TESTDATA.md). */
object Tables {
  /** `events.ts` encoding has drifted across testdata generations:
    * TIMESTAMP(NANOS) (read as LongType nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), then
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) which Spark reads as
    * TIMESTAMP_NTZ. Normalize both to a session-tz TIMESTAMP: every
    * entry point pins the session timezone to UTC, so the NTZ→TZ cast is
    * value-preserving and keeps matching the DuckDB oracle (itself NTZ). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        // integer div: ns values (~1.7e18) exceed double's 2^53 exact range
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Drop a staging table AND its warehouse directory. `DROP TABLE` alone
    * is not enough under the gate: a crashed earlier run can leave the
    * data directory behind with no catalog entry, and the next
    * `saveAsTable` then fails on the non-empty location. */
  def dropStagedTable(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    // conf value may be a file: URI or a bare (possibly relative) path
    val raw = s.conf.get("spark.sql.warehouse.dir",
      new java.io.File("spark-warehouse").toURI.toString)
    val uri = new java.net.URI(raw)
    val warehouse = new java.io.File(
      if (uri.getScheme == "file" || uri.getScheme == null) uri.getPath
      else raw)
    val loc = new java.io.File(warehouse, table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    if (loc.exists()) rm(loc)
  }
}
