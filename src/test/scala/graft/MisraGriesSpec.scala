package graft

import graft.catalyst.MisraGriesAgg
import org.apache.spark.sql.functions._

/** Misra–Gries sketch kernel + the q97 two-phase exact heavy hitters. */
class MisraGriesSpec extends SparkSpec {

  test("sketch state is hard-bounded at k no matter the distinct count") {
    val s = new MisraGriesAgg.Sketch(10)
    (1 to 100000).foreach(i => s.offer(s"item$i"))
    assert(s.counts.size <= 10)
  }

  test("an item above the N/(k+1) frequency bound always survives") {
    // hot = 30% of a 10k stream, k=10 → bound N/11 ≈ 909 < 3000
    val s = new MisraGriesAgg.Sketch(10)
    val rnd = new scala.util.Random(7)
    (1 to 10000).foreach { i =>
      if (i % 10 < 3) s.offer("hot") else s.offer(s"noise${rnd.nextInt(100000)}")
    }
    assert(s.counts.containsKey("hot"))
  }

  test("merge keeps the bound and the capacity under any split") {
    val parts = (0 until 4).map(_ => new MisraGriesAgg.Sketch(10))
    val rnd = new scala.util.Random(13)
    (1 to 20000).foreach { i =>
      val s = parts(i % 4)
      if (i % 5 == 0) s.offer("heavy") else s.offer(s"n${rnd.nextInt(50000)}")
    }
    val merged = parts.reduce { (a, b) => a.mergeIn(b); a }
    assert(merged.counts.size <= 10)
    assert(merged.counts.containsKey("heavy")) // 20% > N/11
  }

  test("misra_gries is SQL-registered and returns candidate strings") {
    graft.catalyst.GraftExtensions.register(spark)
    spark.read.parquet(s"${sf()}/documents.parquet")
      .createOrReplaceTempView("mg_docs")
    val cands = spark.sql(
      """SELECT misra_gries(tok, 50) AS c FROM (
        |  SELECT explode(split(text, ' ')) AS tok FROM mg_docs)""".stripMargin)
      .head().getSeq[String](0)
    assert(cands.nonEmpty && cands.size <= 50)
  }

  test("q97 two-phase result equals the single-phase exact computation") {
    val got = SparkEntry.queries("q97_heavy_hitters")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val toks = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") * 500 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact)
  }
}
