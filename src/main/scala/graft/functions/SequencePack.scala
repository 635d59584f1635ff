package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (context-window prep): assign each doc of a source
  * stream to a fixed token-budget bin by EXCLUSIVE cumulative token count —
  * bin = floor(cum_prev / B), offset = cum_prev mod B. This is the
  * deterministic streaming-fill packing used in practice (docs may straddle
  * a bin edge; the trainer's loader splits them), chosen over true first-fit
  * bin packing because it is order-stable, exact-integer, and one window
  * pass.
  *
  * Scale: packing is inherently sequential PER STREAM — a window
  * partitioned by source alone sorts an entire source's row set inside ONE
  * task, the exact straggler-maker when a corpus has a handful of 10 TB+
  * sources. So the EXECUTED plan salts each source into `substreams`
  * deterministic sub-streams (`sub = doc_id mod S`) that pack
  * independently, bins namespaced by (source, sub): parallelism becomes
  * sources × S regardless of source skew, and each task's sort is 1/S of a
  * source. The trainer consumes (source, sub, bin) as the pack identity —
  * the same contract as one-stream-per-source, just S streams per source.
  * Size S so a sub-stream's rows fit one task comfortably at the target
  * scale (S ≈ source_rows / rows_per_task, a few hundred at 100 TB). */
object SequencePack {

  /** Pack `df` into token-budget bins. Output columns: sourceCol, `sub`,
    * idCol, nTokCol, `bin`, `bin_offset` — one row per input doc, bins
    * namespaced by (sourceCol, sub). `substreams = 1` degenerates to
    * exactly the classic one-stream-per-source packing (sub ≡ 0). */
  def pack(df: DataFrame, sourceCol: String, idCol: String, nTokCol: String,
           budget: Long, substreams: Int): DataFrame = {
    require(budget > 0, s"pack: budget must be positive, got $budget")
    require(substreams > 0, s"pack: substreams must be positive, got $substreams")
    val w = Window.partitionBy(col(sourceCol), col("sub"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("sub", pmod(col(idCol), lit(substreams.toLong)).cast("bigint"))
      .withColumn("cum_prev",
        coalesce(sum(col(nTokCol).cast("long")).over(w), lit(0L)))
      .select(col(sourceCol), col("sub"), col(idCol),
        col(nTokCol).cast("long").as(nTokCol),
        floor(col("cum_prev") / budget).cast("bigint").as("bin"),
        (col("cum_prev") % budget).cast("bigint").as("bin_offset"))
  }

  /** The boundary-splitting completion of [[pack]]: a doc that straddles
    * bin edges becomes one FRAGMENT row per bin it touches — exactly
    * what the trainer's loader materializes (fragment 0 fills the first
    * bin from `bin_offset`, middle fragments fill whole bins, the last
    * takes the remainder). Σ frag_len per doc ≡ n_tok by construction.
    * Input: [[pack]]'s output; output adds (frag, frag_len) with
    * (bin, bin_offset) rewritten per fragment. Scan + bounded explode
    * (≤ n_tok/budget + 1 rows per doc — linear in TOKENS, the same cost
    * class as tokenizing), no new shuffle: fragments inherit the
    * packing's (source, sub) bins. */
  def packFragments(packed: DataFrame, nTokCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"packFragments: budget must be positive, got $budget")
    val rem0 = lit(budget) - col("bin_offset") // capacity left in first bin
    val nTok = col(nTokCol)
    val nfrags = when(nTok <= rem0, lit(1L))
      .otherwise(lit(1L) +
        floor((nTok - rem0 + (budget - 1)) / budget).cast("long"))
    packed
      .withColumn("frag", explode(sequence(lit(0L), nfrags - 1)))
      .select(packed.columns.filterNot(Set("bin", "bin_offset")).map(col) ++ Seq(
        col("frag"),
        (col("bin") + col("frag")).as("bin"),
        when(col("frag") === 0L, col("bin_offset")).otherwise(lit(0L))
          .as("bin_offset"),
        when(col("frag") === 0L, least(nTok, rem0))
          .otherwise(least(lit(budget),
            nTok - rem0 - (col("frag") - 1) * budget))
          .cast("bigint").as("frag_len")): _*)
  }
}
