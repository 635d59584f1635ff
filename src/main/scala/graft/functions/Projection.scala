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
  * engine and any fold order. The sign matrix is a deterministic parity
  * formula shared by the Spark and DuckDB spellings — no RNG, no stored
  * matrix, reproducible across runs/engines (the q66 centroid
  * discipline applied to projections).
  */
object Projection {

  val OutDim = 8

  /** Deterministic ±1 sign for (input dim i — 0-based, output dim j). */
  def sign(i: Int, j: Int): Int = if ((i * 31 + j * 17) % 2 == 0) 1 else -1

  private def quantized(v: String) =
    s"CAST(floor(CAST($v AS DOUBLE) * 1000000.0) AS BIGINT)"

  /** Spark Column for output component j of array column `emb`
    * (0-based `transform` index). */
  def projMicros(emb: String, j: Int): Column =
    expr(s"""aggregate(
      |  transform($emb, (v, i) -> CASE WHEN (i * 31 + $j * 17) % 2 = 0
      |    THEN ${quantized("v")} ELSE -${quantized("v")} END),
      |  0L, (acc, x) -> acc + x)""".stripMargin)

  /** DuckDB spelling of [[projMicros]] (1-based index lambda → i-1). */
  def projMicrosSql(emb: String, j: Int): String =
    s"""CAST(list_sum(list_transform($emb, (v, i) ->
       |  CASE WHEN ((i - 1) * 31 + $j * 17) % 2 = 0
       |    THEN ${quantized("v")} ELSE -${quantized("v")} END)) AS BIGINT)""".stripMargin
}
