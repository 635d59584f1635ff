package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join: for each left row, attach the payload of the
  * latest right row with `right.ts <= left.ts` for the same key — the
  * operator behind feature lookups and slowly-changing joins. Absent from
  * the reference (equi-key only, SURVEY.md §2.5) and from Spark SQL.
  *
  * Implementation is a tagged union + last-observation-carried-forward
  * window — ONE shuffle on the key and one in-partition sort, the same
  * cost envelope as a sort-merge join. No custom SparkPlan: composing
  * union+window keeps Catalyst/AQE in charge (preference order (a) of the
  * custom-operator ladder). Equal timestamps match (ASOF >= semantics):
  * right rows sort before left rows at the same instant.
  *
  * Right-side (key, ts) pairs must be unique for deterministic payloads —
  * pre-aggregate if needed.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String],
           leftJoin: Boolean = true, asOfTsCol: String = "asof_ts"): DataFrame = {
    val collide = left.columns.toSet & payload.toSet
    require(collide.isEmpty, s"payload names collide with left columns: $collide")

    val leftCols = left.columns.toSeq
    // unified schema: left cols ++ payload ++ (__ts, __side)
    val leftPart = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(leftCols.map(col) ++ payload.map(p => lit(null).as(p)) ++
        Seq(col("__ts"), col("__side")): _*)
    val rightPart = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(leftCols.map(c =>
          if (keys.contains(c)) col(c) else lit(null).as(c)) ++
        payload.map(col) ++ Seq(col("__ts"), col("__side")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // Payload and matched timestamp are carried inside ONE struct, so both
    // always come from the same (latest) right row — a matched row with a
    // NULL payload value yields NULL, never an older non-null value
    // (matching DuckDB ASOF JOIN semantics).
    val matchStruct = when(col("__side") === 0,
      struct(col("__ts").as("__rts") +: payload.map(col): _*))
    val filled = leftPart.unionByName(rightPart)
      .withColumn("__match", last(matchStruct, ignoreNulls = true).over(w))

    val out = filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__match.$p").as(p)) :+
        col("__match.__rts").as(asOfTsCol): _*)
    if (leftJoin) out else out.filter(col(asOfTsCol).isNotNull)
  }
}
