package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-governance operators for training corpora: PII redaction and
  * deterministic (reproducible) stratified sampling.
  *
  * Both are pure Column expressions — one corpus scan, whole-stage
  * codegen, zero shuffles — which is what makes them viable as mandatory
  * passes over 100 TB.
  */
object Governance {

  /** Email pattern, ASCII-conservative so Java regex (Spark) and RE2
    * (DuckDB) agree; both engines support this subset identically. */
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone fragment: 3-4 digit groups joined by
    * dashes (555-0123 / 415-555-0123). Conservative on purpose: PII
    * scrubbing favors precision, and the shape avoids matching years or
    * ID ranges like 2020-2024 (4-digit prefix). */
  val PhoneRegex = "\\b[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?\\b"

  /** IPv4 literal (no lookarounds — RE2 has none). */
  val Ipv4Regex = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Count of pattern hits in `text`. */
  def piiHits(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact all email/phone/IPv4 literals with typed placeholders.
    * regexp_replace replaces every occurrence (Spark default; the DuckDB
    * oracle needs the explicit 'g' flag). */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRegex, "<EMAIL>")
    val p = regexp_replace(e, PhoneRegex, "<PHONE>")
    regexp_replace(p, Ipv4Regex, "<IP>")
  }

  /** Deterministic hash bucket in [0,100) for reproducible sampling:
    * 40-bit md5 prefix of (salt || key) mod 100. The SAME rows are kept on
    * every engine, every run, every partitioning — unlike rand()-based
    * sampling, this gives an auditable, re-runnable corpus cut, and a
    * different salt gives an independent draw. */
  def hashBucket(key: Column, salt: String): Column =
    graft.catalyst.Md5Prefix40(concat(lit(salt), key.cast("string"))) % 100

  /** Stratified keep-predicate: keep a row when its hash bucket falls
    * below the stratum's percentage rate. `ratesPct` maps stratum value →
    * keep percentage (0..100); unlisted strata use `defaultPct`. */
  def stratifiedKeep(key: Column, stratum: Column,
                     ratesPct: Seq[(String, Int)], defaultPct: Int,
                     salt: String): Column = {
    val rate = ratesPct.foldRight(lit(defaultPct): Column) {
      case ((value, pct), acc) => when(stratum === value, pct).otherwise(acc)
    }
    hashBucket(key, salt) < rate
  }

  /** Deterministic train/val/test assignment from the hash bucket:
    * bucket < trainPct → "train", < trainPct+valPct → "val", else "test".
    * The standard reproducible dataset split — membership is a pure
    * function of (salt, key), so re-runs, engine changes, and
    * repartitioning cannot leak rows across splits. */
  def splitAssign(key: Column, trainPct: Int, valPct: Int,
                  salt: String): Column = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100)
    val b = hashBucket(key, salt)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** DuckDB spelling of [[hashBucket]]. */
  def oracleHashBucket(keyExpr: String, salt: String): String =
    s"CAST(concat('0x', substr(md5(concat('$salt', CAST($keyExpr AS VARCHAR))), 1, 10)) AS BIGINT) % 100"

  /** Importance-weighted reproducible keep-predicate: keep probability =
    * weightPct / 100, membership a pure function of (salt, key) — the
    * quality-proportional corpus-mixing primitive (sample good docs more
    * often, reproducibly on any engine/run/partitioning). Integer-exact:
    * hash40 · 100 < weightPct · 2^40 stays well inside int64. */
  def weightedKeep(key: Column, weightPct: Column, salt: String): Column =
    graft.catalyst.Md5Prefix40(concat(lit(salt), key.cast("string"))) * 100 <
      weightPct.cast("bigint") * (1L << 40)

  /** DuckDB spelling of [[weightedKeep]]. */
  def oracleWeightedKeep(keyExpr: String, weightExpr: String,
                         salt: String): String =
    s"CAST(concat('0x', substr(md5(concat('$salt', CAST($keyExpr AS VARCHAR))), 1, 10)) AS BIGINT) * 100 " +
      s"< CAST($weightExpr AS BIGINT) * ${1L << 40}"

  /** DuckDB spelling of [[splitAssign]]. */
  def oracleSplitAssign(keyExpr: String, trainPct: Int, valPct: Int,
                        salt: String): String = {
    val b = oracleHashBucket(keyExpr, salt)
    s"CASE WHEN $b < $trainPct THEN 'train' " +
      s"WHEN $b < ${trainPct + valPct} THEN 'val' ELSE 'test' END"
  }
}
