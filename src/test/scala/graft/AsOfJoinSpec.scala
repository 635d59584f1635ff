package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("as-of join attaches the latest right row at or before left ts") {
    val left = Seq((1, 10L), (1, 25L), (2, 5L)).map { case (k, t) => (k, ts(t)) }
      .toDF("k", "t")
    val right = Seq((1, 5L, "a"), (1, 20L, "b"), (1, 30L, "c"), (2, 7L, "z"))
      .map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => (r.getInt(0), r.getTimestamp(1).getTime / 1000,
        r.getString(2))).toSet
    assert(out == Set((1, 10L, "a"), (1, 25L, "b"), (2, 5L, null)))
  }

  test("equal timestamps match (>= semantics)") {
    val left = Seq((1, ts(10))).toDF("k", "t")
    val right = Seq((1, ts(10), "same")).toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.collect().head.getString(2) == "same")
  }

  test("inner variant drops unmatched left rows") {
    val left = Seq((1, ts(1)), (1, ts(50))).toDF("k", "t")
    val right = Seq((1, ts(10), "x")).toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"),
      leftJoin = false)
    assert(out.count() == 1)
  }

  test("plan shuffles once on the key") {
    val left = Seq((1, ts(10))).toDF("k", "t")
    val right = Seq((1, ts(5), "a")).toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
    out.count() // finalize the adaptive plan
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllMatchIn(plan).size == 1)
  }
}
