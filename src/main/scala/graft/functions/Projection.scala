package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Signed (Achlioptas-style ±1) random projection for embedding columns:
  * dim-D float vectors → OutDim integer components, the standard cheap
  * dimensionality reduction in front of LSH / ANN indexing (JL lemma:
  * pairwise distances are preserved in expectation; ±1 signs need no
  * Gaussian sampling and no floats in the projection matrix).
  *
  * Engine-portable by construction: each component is first
  * micro-quantized (`floor(double(v) · 1e6)` — float→double widening and
  * a fixed double product are IEEE-exact), then folded with ±1 signs in
  * BIGINT arithmetic, so the result is an exact integer identical on any
  * engine and any fold order.
  *
  * The sign matrix is derived from MD5 parities of "i:j" at PLAN time
  * (not per row) and embedded as literal arrays in both the Spark and
  * DuckDB spellings. MD5 bits are pairwise-independent for JL purposes —
  * a LINEAR formula like `(a·i + b·j) mod 2` must NOT be used here: it
  * collapses to parity(i+j), every output component becomes ± the same
  * alternating sum, and the projection is rank-1 (distances collapse onto
  * one axis while still passing any shared-formula oracle).
  */
object Projection {

  val OutDim = 8
  val InDim = 64

  /** Deterministic ±1 sign for (input dim i — 0-based, output dim j):
    * parity of the first byte of md5("i:j"). */
  def sign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if ((d(0) & 1) == 0) 1 else -1
  }

  private def signRow(j: Int): Seq[Int] = (0 until InDim).map(sign(_, j))

  private def quantized(v: String) =
    s"CAST(floor(CAST($v AS DOUBLE) * 1000000.0) AS BIGINT)"

  /** Spark Column for output component j of array column `emb`:
    * zip the vector with the literal sign row, fold exactly in BIGINT.
    *
    * PRECONDITION (checked): the embedding must have exactly InDim
    * elements. The engines disagree on ragged input — Spark `zip_with`
    * pads the short side with nulls (whole component NULL), DuckDB
    * `list_transform` just stops (silent PARTIAL sum) — so a wrong-dim
    * vector fails loudly here instead of hash-mismatching downstream. */
  def projMicros(emb: String, j: Int): Column = {
    val signs = signRow(j).mkString("array(", ", ", ")")
    expr(s"""CASE WHEN size($emb) = $InDim THEN aggregate(
      |  zip_with($emb, $signs, (v, s) -> s * ${quantized("v")}),
      |  0L, (acc, x) -> acc + x)
      |ELSE raise_error(concat('projMicros: embedding dimension ',
      |  CAST(size($emb) AS STRING), ' <> required $InDim')) END""".stripMargin)
  }

  /** DuckDB spelling of [[projMicros]] (1-based index lambda). */
  def projMicrosSql(emb: String, j: Int): String = {
    val signs = signRow(j).mkString("[", ", ", "]")
    s"""CAST(list_sum(list_transform($emb, (v, i) ->
       |  ($signs)[i] * ${quantized("v")})) AS BIGINT)""".stripMargin
  }
}
