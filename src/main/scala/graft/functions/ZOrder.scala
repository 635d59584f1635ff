package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys: interleave the bits of two bounded
  * dimensions so that sorting by the key clusters rows that are close in
  * BOTH dimensions. Written with a range-partition + within-partition
  * sort, every file then covers a small rectangle of (x, y) space, and a
  * scan with predicates on either dimension skips most files/row-groups
  * via parquet min-max stats — the standard multi-column data-skipping
  * layout at 100 TB (one sort at write time buys every subsequent scan).
  *
  * The key is a pure integer expression (shifts/masks/adds), built from
  * the same constants in both the Spark Column form and the DuckDB oracle
  * spelling, so layout queries gate cross-engine like everything else.
  * Dimensions are first reduced mod 2^bits — callers with unbounded
  * domains should rank/bucket first (the mod keeps the expression total).
  */
object ZOrder {

  val Bits = 16 // per dimension; key fits in 32 bits

  /** Morton key of (x mod 2^Bits, y mod 2^Bits): bit i of x lands at
    * position 2i, bit i of y at 2i+1. */
  def zkey(x: Column, y: Column): Column = {
    val xm = pmod(x.cast("bigint"), lit(1L << Bits))
    val ym = pmod(y.cast("bigint"), lit(1L << Bits))
    (0 until Bits).map { i =>
      (shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)))
    }.reduce(_.bitwiseOR(_)).as("zkey")
  }

  /** DuckDB spelling of [[zkey]] — generated from the same Bits constant
    * so the two engines cannot drift. `x`/`y` are SQL expressions. */
  def zkeySql(x: String, y: String): String = {
    val xm = s"(($x) % ${1L << Bits} + ${1L << Bits}) % ${1L << Bits}"
    val ym = s"(($y) % ${1L << Bits} + ${1L << Bits}) % ${1L << Bits}"
    (0 until Bits).map { i =>
      s"(((($xm) >> $i) & 1) << ${2 * i}) | (((($ym) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
  }
}
