package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.functions.Similarity
import graft.pipes.Aggs

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("range join matches points to containing intervals only") {
    val points = Seq((1, ts(100)), (1, ts(500)), (2, ts(100)))
      .toDF("k", "t")
    val intervals = Seq(
      (1, ts(50), ts(150), "i1"),   // contains (1,100)
      (1, ts(400), ts(450), "i2"),  // contains nothing
      (2, ts(90), ts(110), "i3"))   // contains (2,100)
      .toDF("k", "s", "e", "name")
    val out = RangeJoin.binned(points, intervals, Seq("k"), "t", "s", "e",
        binWidthSec = 60)
      .select("k", "name").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "i1"), (2, "i3")))
  }

  test("range join: interval spanning many bins still matches once") {
    val points = Seq((1, ts(1000))).toDF("k", "t")
    val intervals = Seq((1, ts(0), ts(10000), "wide")).toDF("k", "s", "e", "name")
    val out = RangeJoin.binned(points, intervals, Seq("k"), "t", "s", "e", 60)
    assert(out.count() == 1)
  }

  test("ivfKnn finds the duplicated vector as nearest neighbor") {
    val vs = (0 until 40).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i * 7 + d).toFloat)
      (i.toLong, base)
    } :+ (100L, Array.tabulate(8)(d => math.sin(3 * 7 + d).toFloat)) // dup of id 3
    val df = vs.toDF("vec_id", "embedding")
    val out = Similarity.ivfKnn(df, df.filter(col("vec_id") === 100), "vec_id",
      "embedding", k = 1, nlist = 8, nprobe = 3)
    val top = out.collect().head
    assert(top.getLong(1) == 3L)
    assert(top.getDouble(2) == 1.0)
  }

  test("ivfKnnKMeans: deterministic under repartitioning, finds the dup") {
    val vs = (0 until 40).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i * 7 + d).toFloat)
      (i.toLong, base)
    } :+ (100L, Array.tabulate(8)(d => math.sin(3 * 7 + d).toFloat)) // dup of id 3
    val df = vs.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 100)
    def run(parts: Int) = Similarity.ivfKnnKMeans(df.repartition(parts), q,
      "vec_id", "embedding", k = 3, nlist = 8, nprobe = 3, iters = 2)
      .collect().map(_.toSeq).toSet
    val a = run(2)
    // exact duplicate must surface as the top neighbor
    assert(a.exists(r => r(3) == 1 && r(1) == 3L && r(2) == 1.0))
    // Lloyd refinement + quantized centroid math must not depend on
    // physical partitioning (sum order, partial-agg order)
    assert(run(7) == a)
  }

  test("firstBy/lastBy pick values by order field, not partition order") {
    val df = Seq(("a", 3, "x3"), ("a", 1, "x1"), ("a", 2, "x2"), ("b", 9, "y9"))
      .toDF("k", "ord", "v")
    val out = df.groupBy("k").agg(
        Aggs.firstBy("v", "ord", "first_v").make(Seq(col("v"), col("ord"))).as("first_v"),
        Aggs.lastBy("v", "ord", "last_v").make(Seq(col("v"), col("ord"))).as("last_v"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out("a") == ("x1", "x3"))
    assert(out("b") == ("y9", "y9"))
  }

  test("Tables.events normalizes nanosecond timestamps to micros") {
    val ev = graft.queries.Tables.events(spark, sf())
    assert(ev.schema("ts").dataType.typeName.startsWith("timestamp"))
    assert(ev.count() > 0)
    // values are in a sane range (year 2024 per the generator)
    val y = ev.select(year(col("ts"))).distinct().collect().map(_.getInt(0)).toSet
    assert(y == Set(2024))
  }
}
