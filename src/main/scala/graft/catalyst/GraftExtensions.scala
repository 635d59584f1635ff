package graft.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT md5_prefix40(s)")`
  * and `minhash_sig(tokens, k)` work from pure SQL.
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.catalyst.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.md5Prefix40Desc)
    e.injectFunction(GraftExtensions.minhashSigDesc)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[Md5Prefix40].getName, null, name, usage, "")

  val md5Prefix40Desc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("md5_prefix40"),
      info("md5_prefix40", "_FUNC_(str) - 40-bit md5-prefix hash as bigint"),
      (exprs: Seq[Expression]) => Md5Prefix40(exprs.head))

  val minhashSigDesc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "_FUNC_(tokens, k) - k-component MinHash signature"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer literal, got $other")
        }
        MinHashSig(exprs.head, k)
      })

  /** Register on an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    Seq(md5Prefix40Desc, minhashSigDesc).foreach { case (id, inf, builder) =>
      registry.registerFunction(id, inf, builder)
    }
  }
}
