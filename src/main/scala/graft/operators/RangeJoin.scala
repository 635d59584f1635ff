package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match each left row's timestamp to the right
  * intervals containing it — log enrichment, session attribution,
  * slowly-changing dimensions. Absent from the reference (equi-key only,
  * SURVEY.md §2.5).
  *
  * Naive non-equi joins degenerate to a nested-loop/cartesian at scale.
  * This lowering bins time: intervals explode to every `binWidthSec`
  * bucket they overlap, points map to one bucket, and the join becomes an
  * EQUI-join on (keys…, bin) followed by the exact BETWEEN filter —
  * shuffle-hash/sort-merge eligible, cost proportional to interval
  * length / bin width. Pick `binWidthSec` near the median interval length.
  */
object RangeJoin {

  def binned(left: DataFrame, right: DataFrame, keys: Seq[String],
             leftTs: String, startCol: String, endCol: String,
             binWidthSec: Long): DataFrame = {
    val w = lit(binWidthSec)
    val leftB = left.withColumn("__bin",
      floor(unix_timestamp(col(leftTs)) / w).cast("long"))
    val rightB = right.withColumn("__bin", explode(sequence(
      floor(unix_timestamp(col(startCol)) / w).cast("long"),
      floor(unix_timestamp(col(endCol)) / w).cast("long"))))
    leftB.join(rightB, keys :+ "__bin")
      .filter(col(leftTs) >= col(startCol) && col(leftTs) <= col(endCol))
      .drop("__bin")
  }
}
