package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler used during performance work (not part of the
  * driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    (1 to 2).foreach { round =>
      time(s"decimal38 sums r$round")(li.groupBy("l_returnflag", "l_linestatus")
        .agg(org.apache.spark.sql.functions.expr("cast(sum(cast(l_quantity as decimal(38,6))) as double) q"),
             org.apache.spark.sql.functions.expr("cast(sum(cast(l_extendedprice as decimal(38,6))) as double) p"),
             org.apache.spark.sql.functions.expr("cast(sum(cast(l_extendedprice*(1-l_discount) as decimal(38,6))) as double) dp"))
        .write.mode("overwrite").format("noop").save())
      time(s"fixedpoint sums r$round")(li.groupBy("l_returnflag", "l_linestatus")
        .agg(org.apache.spark.sql.functions.expr("cast(sum(cast(floor(l_quantity*1000000) as bigint)) as double)/1e6 q"),
             org.apache.spark.sql.functions.expr("cast(sum(cast(floor(l_extendedprice*1000000) as bigint)) as double)/1e6 p"),
             org.apache.spark.sql.functions.expr("cast(sum(cast(floor(l_extendedprice*(1-l_discount)*1000000) as bigint)) as double)/1e6 dp"))
        .write.mode("overwrite").format("noop").save())
    }
    time("signature only")(println("[probe] n=" + d.select(
      graft.functions.Dedup.minhashSignature(org.apache.spark.sql.functions.col("text"), 16)).count()))
    time("shingles only")(println("[probe] n=" + d.select(
      graft.functions.Dedup.shingles(org.apache.spark.sql.functions.col("text"), 3)).count()))
    time("jaccard pairwise 5k")(println("[probe] n=" + {
      val sh = d.select(org.apache.spark.sql.functions.col("doc_id").as("id"),
        graft.functions.Dedup.shingles(org.apache.spark.sql.functions.col("text"), 3).as("sh")).cache()
      sh.count()
      val t = sh.toDF("id1","sh1").crossJoin(sh.toDF("id2","sh2").limit(1))
      t.select(graft.functions.Dedup.jaccardMicros(org.apache.spark.sql.functions.col("sh1"),
        org.apache.spark.sql.functions.col("sh2"))).count()
    }))
    time("jaccard hashed 5k")(println("[probe] n=" + {
      import org.apache.spark.sql.functions._
      val sh = d.select(col("doc_id").as("id"),
        transform(graft.functions.Dedup.shingles(col("text"), 3),
          x => graft.catalyst.Md5Prefix40(x)).as("sh")).cache()
      sh.count()
      val t = sh.toDF("id1","sh1").crossJoin(sh.toDF("id2","sh2").limit(1))
      t.select(graft.functions.Dedup.jaccardMicros(col("sh1"), col("sh2"))).count()
    }))
    val cl = graft.functions.Dedup.minhashClusters(d, "doc_id", "text")
    time("clusters count")(println("[probe] n=" + cl.count()))
    val cands = cl.filter(col("canonical_id") < col("id"))
    time("cands count")(println("[probe] n=" + cands.count()))
    time("neardup pairs")(println("[probe] n=" +
      graft.functions.Dedup.nearDupPairs(d, "doc_id", "text", 400000L).count()))
    spark.stop()
  }
}
