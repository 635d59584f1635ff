package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching.
  *
  * Pairs come from BLOCKS — (first char, length-bucket of width 2) — never
  * from the full cross product, so the candidate-pair count stays
  * near-linear while the Levenshtein filter runs only within blocks. An
  * unblocked fuzzy join at 100 TB is a cartesian disaster.
  *
  * Distance ≤ `maxDist` allows lengths to differ by up to `maxDist`, which
  * can CROSS a width-2 length bucket — so the probe side expands into its
  * bucket and both neighbors (3 join keys per word; each true pair still
  * joins exactly once because the build side's own bucket is a single
  * value). Recall bound: pairs whose FIRST characters differ are dropped by
  * design — that is the price of the block key, identical in any engine
  * spelling the same blocking.
  */
object FuzzyMatch {

  /** Length-bucket id (width 2). */
  def lengthBucket(w: Column): Column = floor(length(w) / 2)

  /** All within-block pairs (w1 < w2) at Levenshtein distance ≤ maxDist.
    * `words` must have a single string column `col`; duplicates are
    * deduplicated before pairing. Supports maxDist ≤ 2 (the neighbor
    * expansion radius of 1 covers a length delta of at most 2). */
  def blockedPairs(words: DataFrame, wordCol: String, maxDist: Int): DataFrame = {
    require(maxDist <= 2,
      s"blockedPairs: maxDist=$maxDist exceeds the radius-1 bucket expansion" +
        " (width-2 buckets cover a length delta of at most 2)")
    val w = words.select(col(wordCol).as("w")).distinct()
      .select(col("w"), substring(col("w"), 1, 1).as("blk_c"),
        lengthBucket(col("w")).as("blk_l"))
    val a = w.select(col("w").as("w1"), col("blk_c"), col("blk_l"))
    val b = w.select(col("w").as("w2"), col("blk_c"),
      explode(array(col("blk_l") - 1, col("blk_l"),
        col("blk_l") + 1)).as("blk_l"))
    // the BOUNDED levenshtein (threshold arg): banded DP that early-exits
    // at O(len·maxDist) per evaluation instead of O(len²), returning -1
    // past the threshold — so the within-block distance test costs
    // O(maxDist) per character even if the optimizer re-derives the
    // predicate from the projection alias on both sides of the filter
    a.join(b, Seq("blk_c", "blk_l"))
      .filter(col("w1") < col("w2"))
      .withColumn("dist", levenshtein(col("w1"), col("w2"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("w1"), col("w2"), col("dist"))
  }
}
