package graft

import org.apache.spark.sql.functions._

/** Brute-force recomputation pins for gate queries whose Spark and DuckDB
  * spellings are GENERATED FROM THE SAME CONSTANTS — the cross-engine hash
  * gate is blind to a wrong formula shared by both sides, so each
  * statistic is recomputed here from first principles (plain Scala over a
  * hand-built corpus) and compared against the registered query itself.
  * q105 has the same treatment in FunctionsSpec (sign-matrix
  * non-degeneracy); these cover q115 (surprisal) and q121 (drift). */
class FormulaPinSpec extends SparkSpec {
  import spark.implicits._

  /** Write a tiny documents table and return its dir (the registered
    * queries read `$dir/documents.parquet`). */
  private def stageDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("formula_pin").toString
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q115 surprisal: floor-log2 bits match brute force and -log2 p within 1 bit") {
    // 3 docs, 12 tokens total: 'aa'×6, 'bb'×3, 'cc'×2, 'dd'×1
    val docs = Seq(
      (1L, "aa aa aa bb cc dd", "s0"),
      (2L, "aa aa bb cc", "s0"),
      (3L, "aa bb", "s0"))
    val dir = stageDocs(docs)
    val got = SparkEntry.queries("q115_surprisal")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // brute force from first principles, independent of the query's code
    val toks = docs.flatMap { case (id, text, _) =>
      text.split(" ").map(id -> _) }
    val cnt = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toLong
    def flog2(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    def bits(t: String) = flog2(n) - flog2(cnt(t))
    val expect = toks.groupBy(_._1).view.mapValues { ts =>
      (ts.size.toLong, ts.map(t => bits(t._2)).sum) }.toMap
    assert(got == expect, s"got=$got expect=$expect")

    // semantic pin: the integer bits are the QUANTIZED true surprisal —
    // within 1 bit of -log2 p(tok) for every token (floor(log2 N) −
    // floor(log2 c) vs log2(N/c) differ by less than 1 either way)
    for (t <- cnt.keys) {
      val truth = -math.log(cnt(t).toDouble / n) / math.log(2)
      assert(math.abs(bits(t) - truth) < 1.0, s"token $t: ${bits(t)} vs $truth")
    }
    // and it is NOT degenerate: the rarest token is strictly more
    // surprising than the most common one
    assert(bits("dd") > bits("aa"))
  }

  test("q128 sequence packing: hand-computed bins, offsets, and invariants") {
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    // classic one-stream-per-source math, pinned through pack(S=1):
    // token counts 100, 200, 50, 300 against budget 256:
    //   cum_prev = 0, 100, 300, 350 → bins 0, 0, 1, 1; offsets 0, 100, 44, 94
    val classic = Seq(
      (1L, words(100), "s0"), (2L, words(200), "s0"),
      (3L, words(50), "s0"), (4L, words(300), "s0"),
      // second source packs independently from zero
      (5L, words(300), "s1"), (6L, words(10), "s1"))
    val cdir = stageDocs(classic)
    val cgot = graft.functions.SequencePack.pack(
        spark.read.parquet(s"$cdir/documents.parquet")
          .select(col("source"), col("doc_id"),
            graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tok")),
        "source", "doc_id", "n_tok", budget = 256L, substreams = 1)
      .collect().map(r => r.getLong(2) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(cgot == Map(
      1L -> (0L, 100L, 0L, 0L), 2L -> (0L, 200L, 0L, 100L),
      3L -> (0L, 50L, 1L, 44L), 4L -> (0L, 300L, 1L, 94L),
      5L -> (0L, 300L, 0L, 0L), 6L -> (0L, 10L, 1L, 44L)))

    // the registered q128 (salted, S=4): sub-streams pack independently.
    // s0 sub1 = ids {1, 5}: cum_prev 0, 100; sub2 = {2, 6}: 0, 200;
    // sub3 = {3, 7}: 0, 50; sub0 = {4, 8}: 0, 300 → id 8 is bin 1
    // offset 44 (300 = 256 + 44). s1 groups are singletons from zero.
    val salted = Seq(
      (1L, words(100), "s0"), (2L, words(200), "s0"),
      (3L, words(50), "s0"), (4L, words(300), "s0"),
      (5L, words(60), "s0"), (6L, words(70), "s0"),
      (7L, words(80), "s0"), (8L, words(90), "s0"),
      (9L, words(300), "s1"), (10L, words(10), "s1"))
    val dir = stageDocs(salted)
    val got = SparkEntry.queries("q128_sequence_packing")(spark, dir)
      .collect().map(r => r.getLong(2) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == Map(
      1L -> (1L, 100L, 0L, 0L), 2L -> (2L, 200L, 0L, 0L),
      3L -> (3L, 50L, 0L, 0L), 4L -> (0L, 300L, 0L, 0L),
      5L -> (1L, 60L, 0L, 100L), 6L -> (2L, 70L, 0L, 200L),
      7L -> (3L, 80L, 0L, 50L), 8L -> (0L, 90L, 1L, 44L),
      9L -> (1L, 300L, 0L, 0L), 10L -> (2L, 10L, 0L, 0L)))
    // invariants: sub = doc_id mod 4; offset within budget
    for ((id, (sub, _, _, off)) <- got) {
      assert(sub == id % 4)
      assert(off >= 0 && off < 256)
    }
  }

  test("q132 mixture sampling: brute-force recomputation of rates and keep set") {
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    // src0 dominant (rate ends up ~0.2%), src10 fractional (~29%), src19
    // under-target (clamps to keep-everything)
    val docs =
      (1L to 10L).map(i => (i, words(100), "src0")) ++
        (21L to 25L).map(i => (i, words(20), "src10")) ++
        (31L to 33L).map(i => (i, words(10), "src19"))
    val dir = stageDocs(docs)
    val got = SparkEntry.queries("q132_mixture_sample")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // independent recomputation from first principles (plain Scala md5 +
    // the documented integer arithmetic, no query code)
    val toks = docs.map { case (id, text, src) =>
      (id, src, text.split(" ").length.toLong) }
    val actual = toks.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = actual.values.sum
    val ratio = graft.queries.Extensions.MixtureBudgetRatioMicros
    val budget = (total / 1000000) * ratio + ((total % 1000000) * ratio) / 1000000
    def rate(src: String): Long = {
      val s = graft.queries.Extensions.MixtureShares(src)
      val target = (budget / 1000000) * s + ((budget % 1000000) * s) / 1000000
      math.min(1000000L, target * 1000000L / actual(src))
    }
    def md5prefix40(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(10), 16)
    }
    val salt = graft.queries.Extensions.MixtureSalt
    val expect = toks.filter { case (id, src, _) =>
      md5prefix40(salt + id) * 1000000L < rate(src) * (1L << 40) }
      .map { case (id, src, n) => (src, id, n) }.toSet
    assert(got == expect, s"got=$got expect=$expect")
    // semantic pins: the clamp keeps ALL of the under-target source, and
    // the share ramp orders the rates
    assert(rate("src19") == 1000000L)
    assert(expect.count(_._1 == "src19") == 3)
    assert(rate("src0") < rate("src10"))
  }

  test("q121 drift: exact integer L1 statistic matches brute force and N·M·Σ|p−q|") {
    // probe source src0 skewed long (20-token docs), rest short (10-token)
    def words(k: Int) = Seq.fill(k)("w").mkString(" ")
    val docs = Seq(
      (1L, words(20), "src0"), (2L, words(20), "src0"), (3L, words(10), "src0"),
      (4L, words(10), "srcA"), (5L, words(10), "srcA"), (6L, words(10), "srcB"),
      (7L, words(20), "srcB"), (8L, words(30), "srcB"))
    val dir = stageDocs(docs)
    val got = SparkEntry.queries("q121_drift")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // brute force: bucket = floor(tokens/10)*10 over a whitespace count
    val bucketed = docs.map { case (_, text, src) =>
      (text.split(" ").length / 10 * 10).toLong -> (src == "src0") }
    val buckets = bucketed.map(_._1).distinct
    val m = bucketed.count(_._2).toLong  // probe total
    val n = bucketed.count(!_._2).toLong // rest total
    val expect = buckets.map { b =>
      val np = bucketed.count(x => x._1 == b && x._2).toLong
      val nr = bucketed.count(x => x._1 == b && !x._2).toLong
      b -> (np, nr, math.abs(nr * m - np * n))
    }.toMap
    assert(got == expect, s"got=$got expect=$expect")

    // semantic pin: Σ drift_term == N·M·Σ|p̂_i − q̂_i| (the scale-free
    // two-sample L1 distance), recomputed in floating point
    val l1 = buckets.map { b =>
      val p = bucketed.count(x => x._1 == b && x._2).toDouble / m
      val q = bucketed.count(x => x._1 == b && !x._2).toDouble / n
      math.abs(p - q)
    }.sum
    val driftSum = got.values.map(_._3).sum.toDouble
    assert(math.abs(driftSum - n * m * l1) < 1e-6 * n * m,
      s"sum=$driftSum vs nmL1=${n * m * l1}")
    // non-degeneracy: the designed skew is detected (nonzero statistic)
    assert(driftSum > 0)
  }

  test("q143 hash classifier: logit equals a plain-Scala recomputation of " +
       "the hashing-trick weights, multiplicity included") {
    val dir = stageDocs(Seq(
      (1L, "the cat sat on the mat", "s"),   // repeated 'the' counts twice
      (2L, "one token", "s"),
      (3L, "zz", "s")))
    def md5prefix40(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(10), 16)
    }
    def weight(tok: String): Long =
      md5prefix40("w#" + (md5prefix40(tok) % 4096)) % 201L - 100L
    val expect = Map(
      1L -> "the cat sat on the mat", 2L -> "one token", 3L -> "zz"
    ).map { case (id, text) =>
      id -> text.split(" ").map(weight).sum
    }
    val got = graft.queries.Extensions.queries("q143_hash_classifier")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, logit) =>
      val (nTok, gotLogit, kept) = got(id)
      assert(gotLogit == logit, s"doc $id logit")
      assert(kept == (logit >= 0L), s"doc $id kept flag")
    }
    assert(got(1L)._1 == 6 && got(2L)._1 == 2 && got(3L)._1 == 1)
    // non-degeneracy: the weight table is not constant across these buckets
    assert(Set("the", "cat", "sat", "on", "mat", "one", "token", "zz")
      .map(weight).size > 1)
  }
}
