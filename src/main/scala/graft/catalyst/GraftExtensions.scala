package graft.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.DoubleType

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT md5_prefix40(s)")`
  * and `minhash_sig(tokens, k)` work from pure SQL.
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.catalyst.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(e.injectFunction)
}

object GraftExtensions {
  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val md5Prefix40Desc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("md5_prefix40"),
      info(classOf[Md5Prefix40], "md5_prefix40", "_FUNC_(str) - 40-bit md5-prefix hash as bigint"),
      (exprs: Seq[Expression]) => Md5Prefix40(exprs.head))

  val md5Prefix60Desc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("md5_prefix60"),
      info(classOf[Md5Prefix60], "md5_prefix60", "_FUNC_(str) - 60-bit md5-prefix hash as bigint"),
      (exprs: Seq[Expression]) => Md5Prefix60(exprs.head))

  val minhashSigDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_sig"),
      info(classOf[MinHashSig], "minhash_sig", "_FUNC_(tokens, k) - k-component MinHash signature"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs.head, intLit(exprs(1), "minhash_sig k")))

  val minhashAggDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_agg"),
      info(classOf[MinHashAgg], "minhash_agg",
        "_FUNC_(tokens, k) - group-level MinHash signature (aggregate)"),
      (exprs: Seq[Expression]) =>
        MinHashAgg(exprs.head, intLit(exprs(1), "minhash_agg k"))
          .toAggregateExpression())

  val topkAggDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("topk_agg"),
      info(classOf[TopKAgg], "topk_agg",
        "_FUNC_(value, k) - k largest values per group, sorted desc (aggregate)"),
      (exprs: Seq[Expression]) =>
        TopKAgg(exprs.head, intLit(exprs(1), "topk_agg k"))
          .toAggregateExpression())

  val simhash32Desc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("simhash32"),
      info(classOf[SimHash32], "simhash32", "_FUNC_(tokens) - 32-bit SimHash of the token multiset"),
      (exprs: Seq[Expression]) => SimHash32(exprs.head))

  val rollingFingerprintDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("rolling_fingerprint"),
      info(classOf[RollingFingerprint], "rolling_fingerprint",
        "_FUNC_(tokens) - positional rolling-hash fingerprint mod 1e9+7"),
      (exprs: Seq[Expression]) => RollingFingerprint(exprs.head))

  val winnowFpDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("winnow_fp"),
      info(classOf[WinnowFingerprints], "winnow_fp",
        "_FUNC_(tokens, n, w) - packed winnowing fingerprints (h<<20|pos)"),
      (exprs: Seq[Expression]) =>
        WinnowFingerprints(exprs.head, intLit(exprs(1), "winnow_fp n"),
          intLit(exprs(2), "winnow_fp w")))

  val shinglesDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("shingles"),
      info(classOf[Shingles], "shingles", "_FUNC_(tokens, n) - word n-gram shingles"),
      (exprs: Seq[Expression]) =>
        Shingles(exprs.head, intLit(exprs(1), "shingles n")))

  val cosineSimDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSim], "cosine_sim", "_FUNC_(a, b) - cosine similarity of float arrays"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1)))

  val exactSumMicrosDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("exact_sum_micros"),
      info(classOf[ExactMicrosSum], "exact_sum_micros",
        "_FUNC_(x) - exact sum at 6 decimal digits, identical to " +
          "cast(sum(cast(x as decimal(38,6))) as double) but codegen-fast"),
      (exprs: Seq[Expression]) =>
        ExactMicrosSum(Cast(exprs.head, DoubleType)).toAggregateExpression())

  val topTokenMassDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("top_token_mass_micros"),
      info(classOf[TopTokenMass], "top_token_mass_micros",
        "_FUNC_(tokens) - most-frequent-token mass fraction x1e6 (floor)"),
      (exprs: Seq[Expression]) => TopTokenMass(exprs.head))

  val misraGriesDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("misra_gries"),
      info(classOf[MisraGriesAgg], "misra_gries",
        "_FUNC_(item, k) - bounded-state frequent-items candidate sketch " +
          "(aggregate). NOT DETERMINISTIC across retries/re-evaluation: " +
          "low-frequency survivors depend on partial-merge order, so two " +
          "evaluations of the same query may return different arrays. Use " +
          "the two-phase exact pattern (sketch -> candidate filter -> exact " +
          "count, as q97) for reproducible results; never place raw sketch " +
          "output under a cross-engine or cross-run comparison."),
      (exprs: Seq[Expression]) =>
        MisraGriesAgg(exprs.head, intLit(exprs(1), "misra_gries k"))
          .toAggregateExpression())

  val minkPairsAggDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("mink_pairs_agg"),
      info(classOf[MinKPairsAgg], "mink_pairs_agg",
        "_FUNC_(v, id, k) - k lexicographically smallest (v, id) pairs " +
          "per group, sorted asc (aggregate); array position = rank"),
      (exprs: Seq[Expression]) =>
        MinKPairsAgg(exprs.head, exprs(1), intLit(exprs(2), "mink_pairs_agg k"))
          .toAggregateExpression())

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(md5Prefix40Desc, md5Prefix60Desc, minhashSigDesc, minhashAggDesc, simhash32Desc,
      rollingFingerprintDesc, shinglesDesc, winnowFpDesc, cosineSimDesc,
      exactSumMicrosDesc, topTokenMassDesc, topkAggDesc, misraGriesDesc,
      minkPairsAggDesc)

  /** Register on an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    all.foreach { case (id, inf, builder) =>
      registry.registerFunction(id, inf, builder)
    }
  }
}
