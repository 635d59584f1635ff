package graft

import org.apache.spark.sql.functions._
import graft.functions.Skew

/** Skew utilities + native hash kernel equivalence. */
class SkewAndHashSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals plain count per key") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i))
      .toDF("k", "v")
    val salted = Skew.saltedCount(df, Seq("k"), saltBuckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted aggregate spreads keys over salt buckets in phase 1") {
    val df = Seq.fill(100)(("hot", 1)).toDF("k", "v")
    val out = Skew.saltedAggregate(df, Seq("k"), 4,
      partials = Seq("pc" -> count(lit(1))),
      finals = Seq("n" -> sum(col("pc"))))
    assert(out.collect().head.getLong(1) == 100L)
  }

  test("salted join equals plain join") {
    val big = (1 to 500).map(i => (i % 5, i)).toDF("k", "v")
    val small = Seq((0, "z"), (1, "a"), (2, "b"), (3, "c"), (4, "d"))
      .toDF("sk", "name")
    val salted = Skew.saltedJoin(big, small, "k", "sk", 4)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("AQE splits a skewed sort-merge join at runtime; saltedJoin is the explicit fallback") {
    // When to use which (the 100 TB decision): AQE's skew-join handling
    // splits oversized SHUFFLE JOIN partitions at runtime with zero query
    // changes — prefer it whenever it applies (shuffle sort-merge/hash
    // joins under AQE). Skew.saltedJoin is the explicit-rewrite fallback
    // for the cases AQE does not cover: skewed AGGREGATIONS
    // (saltedCount/saltedAggregate), engines/paths with AQE disabled, and
    // joins that must keep a specific partitioning downstream.
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // local-scale thresholds so a ~4 MB hot partition counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      // high-entropy per-row padding: shuffle statistics use COMPRESSED
      // partition sizes, so a constant pad would deflate below threshold
      def pad(i: Int) = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes)
        // mask to 0..255 BEFORE xor: a negative Byte promotes to Int and
        // would format as 8 chars ("ffffff9c"), padding the string with
        // compressible constant runs
        (0 until 4).map(r => h.map(b => f"${(b & 0xff) ^ r}%02x").mkString).mkString
      }
      // key 1 holds ~2/3 of the fact side; the rest spreads over 2..501
      val big = (1 to 30000)
        .map(i => (if (i % 3 != 0) 1L else (i % 500).toLong + 2, pad(i)))
        .toDF("k", "pad")
      val small = (1L to 502L).map(i => (i, s"v$i")).toDF("sk", "v")
      val joined = big.join(small, col("k") === col("sk"))
      // materialize THIS query execution (count() would plan a separate
      // aggregate query, leaving joined's adaptive plan unexecuted)
      assert(joined.collect().length == 30000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected an AQE skew-split join in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the shuffle probe side of a selective join") {
    // The third leg of the skew/scale toolkit beside AQE skew-split and
    // saltedJoin: when one join side carries a selective filter, Spark can
    // inject a bloom-filter semi-reduction on the OTHER side's scan, so
    // the 100 TB probe relation drops non-matching rows BEFORE the
    // shuffle. Size thresholds (creation ≤10 MB build, probe scan ≥10 GB)
    // gate it in production; the test lowers them to demonstrate the
    // mechanism at local scale.
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    val dir = java.nio.file.Files.createTempDirectory("bloomrf").toString
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      // file-based relations: the injection rewrites the probe-side SCAN,
      // so both sides must be real sources (not LocalRelations)
      (1L to 50000L).map(i => (i, s"p$i")).toDF("fk", "payload")
        .write.mode("overwrite").parquet(s"$dir/fact")
      (1L to 5000L).map(i => (i, i % 97)).toDF("dk", "attr")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("attr") === 0) // selective
      val joined = fact.join(dim, col("fk") === col("dk"))
      val n = joined.collect().length
      assert(n == 5000 / 97) // multiples of 97 in 1..5000
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected a runtime bloom filter on the probe scan in:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("Md5Prefix40 equals the SQL hex formula on random strings") {
    val samples = scala.util.Random.alphanumeric.grouped(12).map(_.mkString)
      .take(200).toSeq ++ Seq("", "a", "日本語", "with space", "\ttab")
    val df = samples.toDF("s")
    val mismatches = df.select(
        graft.catalyst.Md5Prefix40(col("s")).as("native"),
        expr("cast(conv(substr(md5(s), 1, 10), 16, 10) as bigint)").as("sql"))
      .filter(col("native") =!= col("sql")).count()
    assert(mismatches == 0)
  }

  test("extensions register native functions for SQL use") {
    graft.catalyst.GraftExtensions.register(spark)
    Seq("abc").toDF("s").createOrReplaceTempView("ext_t")
    val r = spark.sql(
      "SELECT md5_prefix40(s) AS h, minhash_sig(split(s, ' '), 4) AS sig FROM ext_t")
      .collect().head
    assert(r.getLong(0) ==
      Seq("abc").toDF("s")
        .select(expr("cast(conv(substr(md5(s),1,10),16,10) as bigint)"))
        .collect().head.getLong(0))
    assert(r.getSeq[Long](1).length == 4)
    // full kernel surface is SQL-reachable, including the aggregate form
    val r2 = spark.sql(
      """SELECT simhash32(split(s, ' ')) AS sh,
        |rolling_fingerprint(split(s, ' ')) AS fp,
        |shingles(split(s, ' '), 2) AS sg,
        |cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs
        |FROM ext_t""".stripMargin).collect().head
    assert(r2.getDouble(3) == 1.0)
    val agg = spark.sql(
      "SELECT minhash_agg(split(s, ' '), 4) AS sig FROM ext_t")
      .collect().head.getSeq[Long](0)
    assert(agg.length == 4)
    assert(agg == Seq("abc").toDF("s")
      .select(graft.catalyst.MinHashSig(split(col("s"), " "), 4))
      .collect().head.getSeq[Long](0))
  }

  test("explicit BloomPrune.semiJoin: row parity with the exact semi join; " +
       "sketch prunes the probe side") {
    import graft.functions.BloomPrune
    // 10k probe rows over keys 1..2000; build side = keys 1..2000 with
    // attr==0 (every 97th) — selective, so most probe rows are prunable
    val probe = (1 to 10000).map(i => (i.toLong % 2000 + 1, s"p$i"))
      .toDF("fk", "payload")
    val build = (1L to 2000L).map(i => (i, i % 97)).toDF("dk", "attr")
      .filter(col("attr") === 0)
    val exact = probe.join(build, col("fk") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val pruned = BloomPrune.semiJoin(probe, build, "fk", "dk",
      estItems = 100L, numBits = 1024L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned == exact, "bloom pruning must not change the join result")
    // no false negatives: every exact-match probe row passes the sketch
    val sketch = BloomPrune.bloomOf(build.select(col("dk")), "dk", 100L, 1024L)
    val kept = probe.filter(BloomPrune.mightContain(sketch, col("fk")))
    assert(kept.join(build, col("fk") === col("dk"), "left_semi").count() ==
      exact.size)
    // and the sketch genuinely prunes: survivors well under the probe total
    val nKept = kept.count()
    assert(nKept < 10000 && nKept >= exact.size,
      s"sketch should drop most non-matching probe rows (kept $nKept)")
  }

  test("Md5Prefix40 stays inside whole-stage codegen") {
    // needs a real scan: a literal-backed LocalRelation constant-folds the
    // whole projection at plan time
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(graft.catalyst.Md5Prefix40(col("lang")).as("h"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty)
    assert(df.count() > 0)
  }
}
