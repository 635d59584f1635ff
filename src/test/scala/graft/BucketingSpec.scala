package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.CFields
import graft.pipes._
import graft.sources.DataFrameTap
import graft.exec.Flow

/** Co-located (bucketed) joins and n-way BufferJoin — the zero-shuffle and
  * multi-iterator paths that matter at cluster scale. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._
  implicit def s: org.apache.spark.sql.SparkSession = spark

  test("PingPongBucketedTap: swap is reader-safe; bucketing survives the view") {
    val tap = graft.sources.PingPongBucketedTap("pp_spec", 4, Seq("k"))
    tap.drop(spark)
    val d0 = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val d1 = (101 to 140).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    tap.write(d0, graft.sources.SinkMode.Replace)
    assert(tap.liveGeneration(spark) == 0)
    tap.write(d1, graft.sources.SinkMode.Update) // appends hit the live gen
    assert(spark.table("pp_spec").count() == 140)
    val filesBefore = spark.table("pp_spec__g0").inputFiles.length

    // a reader PLANNED BEFORE the swap: force full physical planning so
    // its file listing is the pre-swap generation's
    val preSwap = spark.table("pp_spec").filter(col("k") <= 1000)
    preSwap.queryExecution.executedPlan // materialize the scan

    tap.compact(spark)
    assert(tap.liveGeneration(spark) == 1)
    val filesAfter = spark.table("pp_spec").inputFiles.length
    assert(filesAfter <= 4 && filesAfter < filesBefore,
      s"compact must collapse to ≤ buckets files (before=$filesBefore after=$filesAfter)")
    // the pre-swap reader still reads a complete, consistent file set —
    // the retired generation's files survive until the NEXT compact
    // (BucketedTap.compact's drop+rename would have deleted them here)
    assert(preSwap.count() == 140)
    assert(spark.catalog.tableExists("pp_spec__g0"), "old gen survives one cycle")

    // bucketing metadata is transparent through the view: an aggregate
    // on the bucket key plans with NO exchange
    val agg = spark.table("pp_spec").groupBy("k").count()
    val exchanges = agg.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "bucket-key aggregate through the view must not shuffle")

    // the NEXT compact retires g0 (its slot is rewritten)
    tap.write((141 to 150).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      graft.sources.SinkMode.Update)
    tap.compact(spark)
    assert(tap.liveGeneration(spark) == 0)
    assert(spark.table("pp_spec").count() == 150)
    // values round-trip exactly
    assert(spark.table("pp_spec").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      == (1 to 150).map(i => (i.toLong, s"v$i")).toSet)
    tap.drop(spark)
  }

  test("bucketed tables join without a shuffle exchange") {
    // clear any stale managed-table locations from prior runs
    Seq("bk_a", "bk_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    val a = (1 to 100).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1 to 100).map(i => (i, s"b$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bk_a")
    b.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bk_b")
    val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
    // disable broadcast so the co-located sort-merge path is exercised
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined2 = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val exchanges = joined2.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, "bucketed join must not shuffle")
      assert(joined2.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert(joined.count() == 100)
  }

  test("BucketedTap round-trip: co-bucketed DSL join plans without exchange") {
    Seq("bt_a", "bt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(loc)
      }
    }
    val ta = graft.sources.BucketedTap("bt_a", 4, Seq("k"), Seq("k"))
    val tb = graft.sources.BucketedTap("bt_b", 4, Seq("k2"), Seq("k2"))
    ta.write((1 to 50).map(i => (i, s"a$i")).toDF("k", "va"), graft.sources.SinkMode.Replace)
    tb.write((1 to 50).map(i => (i, s"b$i")).toDF("k2", "vb"), graft.sources.SinkMode.Replace)
    val p = Pipe.source(ta).coGroup(Seq("k"), Pipe.source(tb), Seq("k2"))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Flow.toDF(p)
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, "co-bucketed DSL coGroup must not shuffle")
      assert(df.count() == 50)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("persisted band index: daily batch joins with zero corpus-side exchange") {
    import graft.functions.Dedup
    graft.queries.Tables.dropStagedTable(spark, "bt_bandidx")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six"),
      (12L, "alpha beta gamma delta epsilon"), // batch near-dup of 1 and 2
      (13L, "totally unrelated payload words here")
    ).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" < 10)
    val batch = docs.filter($"doc_id" >= 10)
    // build the index ONCE (the amortized cost of the daily-ingest loop)
    Dedup.bandIndexTap("bt_bandidx", 4).write(
      Dedup.bandIndex(corpus, "doc_id", "text"), graft.sources.SinkMode.Replace)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val viaIndex = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Dedup.incrementalNearDupsAgainstIndex(
        spark.table("bt_bandidx"), batch, "doc_id", "text")
      val plan = df.queryExecution.executedPlan.toString
      // exactly ONE (band, key) exchange — the O(batch) side; a second
      // would mean the corpus index is being reshuffled per batch
      assert("Exchange hashpartitioning\\(band".r.findAllMatchIn(plan).size == 1,
        plan)
      assert(plan.contains("SelectedBucketsCount"),
        s"corpus side must be a bucket-aware index scan:\n$plan")
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    // doc 12 collides with both corpus twins; 13 matches nothing
    assert(viaIndex == Set((12L, 1L, 2L)))
    // and the indexed path computes exactly what the one-shot overload does
    val recompute = Dedup.incrementalNearDups(corpus, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIndex == recompute)
  }

  test("band index maintenance: append preserves layout; mismatched spec fails") {
    import graft.functions.Dedup
    graft.queries.Tables.dropStagedTable(spark, "bt_bandidx_m")
    val day0 = Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    val day1 = Seq((11L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val tap = Dedup.bandIndexTap("bt_bandidx_m", 4)
    tap.write(Dedup.bandIndex(day0, "doc_id", "text"),
      graft.sources.SinkMode.Replace)
    tap.write(Dedup.bandIndex(day1, "doc_id", "text"),
      graft.sources.SinkMode.Update)
    // the appended index is live: a day-2 twin of day-1's text must match
    // BOTH its day-0 and day-1 twins
    val day2 = Seq((21L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDupsAgainstIndex(
        spark.table("bt_bandidx_m"), day2, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((21L, 1L, 2L)))
    // and the layout cannot silently degrade: appending with a DIFFERENT
    // bucket spec is rejected by the catalog, not absorbed
    val ex = intercept[Exception] {
      Dedup.bandIndexTap("bt_bandidx_m", 8).write(
        Dedup.bandIndex(day1, "doc_id", "text"),
        graft.sources.SinkMode.Update)
    }
    assert(ex.getMessage.toLowerCase.contains("bucket"), ex.getMessage)
  }

  test("3-way bufferJoinN provides one iterator per input") {
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "va")
    val b = Seq((1, "b1"), (1, "b1x"), (3, "b3")).toDF("k2", "vb")
    val c = Seq((2, "c2")).toDF("k3", "vc")
    val p = Pipe.source(DataFrameTap(a)).bufferJoinN(
      Seq("k"),
      Seq(Pipe.source(DataFrameTap(b)) -> Seq("k2"),
          Pipe.source(DataFrameTap(c)) -> Seq("k3")),
      CFields.typed("k" -> IntegerType, "na" -> IntegerType,
        "nb" -> IntegerType, "nc" -> IntegerType),
      (key, its) => Iterator.single(
        Seq(key.head, its(0).size, its(1).size, its(2).size)))
    val got = Flow.toDF(p).collect().map(_.toSeq).toSet
    assert(got == Set(
      Seq(1, 1, 2, 0), Seq(2, 1, 0, 1), Seq(3, 0, 1, 0)))
  }

  test("embedding near-dups finds duplicated vectors only") {
    // vec 2 = vec 1 scaled: same direction → provably identical sign
    // bucket (projections scale), cosine exactly 1
    val vs = Seq(
      (1L, Array(3.0f, 1.0f, 2.0f)),
      (2L, Array(6.0f, 2.0f, 4.0f)),
      (3L, Array(-1.0f, 3.0f, -2.0f))
    ).toDF("vec_id", "embedding")
    val pairs = graft.functions.Similarity
      .embeddingNearDups(vs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticDedup: min-id survivor per clique, non-dups keep") {
    // 1, 2, 4 are scaled copies (mutual cosine exactly 1 — a 3-clique);
    // 3 points elsewhere. Min-id rule: 1 survives the clique; 2 has one
    // smaller near vector (1), 4 has two (1 and 2); 3 keeps untouched.
    val vs = Seq(
      (1L, Array(3.0f, 1.0f, 2.0f)),
      (2L, Array(6.0f, 2.0f, 4.0f)),
      (3L, Array(-1.0f, 3.0f, -2.0f)),
      (4L, Array(1.5f, 0.5f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = graft.functions.Similarity
      .semanticDedup(vs, "vec_id", "embedding", 0.99)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, true, -1L, 0L),
      (2L, false, 1L, 1L),
      (3L, true, -1L, 0L),
      (4L, false, 1L, 2L)))
  }

  test("LM counts tap: scoring against the bucketed count table plans " +
       "zero gram-side exchanges and returns the direct-scoring values") {
    val table = "bk_lmcounts"
    graft.queries.Tables.dropStagedTable(spark, table)
    val train = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran to the mat"),
      (3L, "a dog sat on a mat")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the cat sat on a mat"),
      (11L, "zz qq ww")).toDF("doc_id", "text")
    val LM = graft.functions.LanguageModel
    LM.countsTap(table, 4).write(LM.trainCounts(train),
      graft.sources.SinkMode.Replace)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val autoScan = spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      val indexed = LM.scoreAgainstCounts(spark.table(table), batch)
      val plan = indexed.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\(g#".r.findAllMatchIn(plan).isEmpty,
        s"count table must never be exchanged:\n$plan")
      assert("SelectedBucketsCount".r.findAllMatchIn(plan).size >= 5,
        "all five lookups must be bucket-aware scans")
      val got = indexed.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val direct = LM.stupidBackoff(train, batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == direct, s"indexed=$got direct=$direct")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        autoScan)
    }
  }

  test("semanticDedup maxBucket guard fires on a dense embedding cluster") {
    // 50 scaled copies of one direction → all land in ONE sign bucket
    // (projections scale with the vector, signs are invariant): the
    // data-dependent skew case where Σ bucket² goes quadratic. With
    // maxBucket = 10 the in-query population guard must fail the job with
    // the directed message, not silently run the 50²-pair bucket.
    val dense = (1 to 50).map(i =>
      (i.toLong, Array(3.0f * i, 1.0f * i, 2.0f * i))) :+
      (99L, Array(-1.0f, 3.0f, -2.0f))
    val vs = dense.toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      graft.functions.Similarity
        .semanticDedup(vs, "vec_id", "embedding", 0.99, maxBucket = 10L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val msg = messages(e).mkString("\n")
    assert(msg.contains("maxBucket=10"), s"unexpected error: $msg")
    assert(msg.contains("nPlanes"), s"error not directed at the knob: $msg")
    // same corpus passes untouched under the default bound
    val ok = graft.functions.Similarity
      .semanticDedup(vs, "vec_id", "embedding", 0.99)
      .filter(col("kept")).count()
    assert(ok >= 2) // min-id survivor of the dense clique + the outlier
  }

  test("semanticDedupAdaptive escalates a splittable dense region but " +
       "still fails directed on an unsplittable one") {
    import graft.functions.Similarity
    // a SPLITTABLE crowd: 30 one-hot vectors on axes k = i%7 (dim 7).
    // The plane family gives the 7 axes pairwise-distinct 11-plane sign
    // patterns (verified by direct computation of
    // ((j·31 + k·17) mod 7) − 3) but only 3 distinct 2-plane prefixes —
    // so 2 base planes crowd ~13 vectors into a bucket (> maxBucket=6,
    // escalation MUST fire) while 11 planes split every class to ≤ 5
    val spread = (0 until 30).map { i =>
      val v = Array.fill(7)(0.0f)
      v(i % 7) = 1.0f + i
      (i.toLong, v)
    }
    val adaptive = Similarity.semanticDedupAdaptive(
      spread.toDF("vec_id", "embedding"), "vec_id", "embedding",
      simThreshold = 0.999, basePlanes = 2, extraPlanes = 3,
      maxBucket = 6L, maxRounds = 3)
      .collect()
    // every vector got a verdict, and at least one escalated (a 2-plane
    // split of 30 spread vectors cannot keep every bucket ≤ 6)
    assert(adaptive.length == 30)
    assert(adaptive.exists(_.getInt(1) > 0))
    // an UNSPLITTABLE cluster (scaled copies: signs invariant under any
    // plane) larger than maxBucket exhausts escalation → directed error
    val unsplittable = (1 to 12).map(i =>
      (i.toLong, Array(3.0f * i, 1.0f * i, 2.0f * i, 1.5f * i)))
    val e = intercept[Exception] {
      Similarity.semanticDedupAdaptive(
        unsplittable.toDF("vec_id", "embedding"), "vec_id", "embedding",
        simThreshold = 0.99, basePlanes = 2, extraPlanes = 3,
        maxBucket = 6L, maxRounds = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val msg = messages(e).mkString("\n")
    assert(msg.contains("after 3 escalations"), s"unexpected error: $msg")
    assert(msg.contains("maxBucket=6"), s"not directed: $msg")
  }
}
