package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) with DETERMINISTIC
  * md5-nibble hashing — the bounded-memory counting structure, built so
  * the DuckDB oracle reproduces every cell and every estimate exactly
  * (both engines spell md5 identically; the cell key is a hex-nibble
  * PREFIX STRING, so no cross-engine integer conversion is needed).
  *
  *   cell_j(w) = substr(md5(j || ':' || w), 1, 3)   — 4096 cells/row
  *   est(w)    = min_j n[j, cell_j(w)]              — depth 4
  *
  * CMS guarantees est ≥ exact (never under), with overcounts bounded by
  * collisions; on the salted synth ~2% of the ~2k tokens collide at
  * every SF, so the min-over-rows arm is exercised in the gated VALUES.
  *
  * The 100 TB story is the whole point of the structure: the sketch is
  * d × 4096 rows NO MATTER the corpus size — built in one counting scan
  * with map-side partials (cell-wise addition IS the merge operator, so
  * partial aggregation is sketch merging), and the estimate side
  * broadcasts it. Exact heavy-hitters live in MisraGriesAgg (q97); the
  * CMS answers point queries over the full key space at fixed memory.
  *
  * Reference frame: no sketch surface in cascading-flink; first-class
  * LLM-pipeline extension (SURVEY §2.28) next to HLL (q42) and
  * Misra–Gries (q97). */
object Sketch {
  val CmsDepth = 4
  val CmsNibbles = 3 // 16^3 = 4096 cells per row

  /** Row-j cell key of a token — a hex-nibble prefix string. */
  def cmsCell(tok: Column, j: Int): Column =
    substring(md5(concat(lit(s"$j:"), tok)), 1, CmsNibbles)

  private def jcArray(tok: Column): Column =
    array((0 until CmsDepth).map(j =>
      struct(lit(j).as("j"), cmsCell(tok, j).as("cell"))): _*)

  /** Build the sketch from the corpus: one counting scan → the
    * (j, cell, n) table, ≤ depth × 16^nibbles rows. */
  def cmsBuild(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("exact"))
      .select(col("exact"), explode(jcArray(col("w"))).as("jc"))
      .groupBy(col("jc.j").as("j"), col("jc.cell").as("cell"))
      .agg(sum(col("exact")).as("n"))

  /** Point-query every distinct corpus token against the sketch:
    * (w, exact, est, over) with est = min over rows, over = est − exact
    * (≥ 0 by the CMS guarantee). The sketch side broadcasts. A queried
    * cell ABSENT from the sketch table counts 0 (the zero-initialized
    * CMS array) — left join + coalesce, so a token outside the build
    * corpus estimates 0 instead of dropping (true point-query
    * semantics; value-identical for q290/q291 where estimate tokens =
    * build tokens and every cell exists). */
  def cmsEstimates(sketch: DataFrame, docs: DataFrame,
                   textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("exact"))
      .select(col("w"), col("exact"), explode(jcArray(col("w"))).as("jc"))
      .join(broadcast(sketch),
        col("jc.j") === sketch("j") && col("jc.cell") === sketch("cell"),
        "left")
      .groupBy("w", "exact")
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
      .select(col("w"), col("exact"), col("est"),
        (col("est") - col("exact")).as("over"))

  /** PER-WINDOW sketch cells — the sliding-cadence layout: (win, j,
    * cell, n), one bounded d × 4096 table per window. The design point
    * is how the monitor FORGETS: eviction is DROPPING an expired
    * window's rows (a partition delete at scale), never decrementing a
    * shared table — CMS cells can be added but not safely subtracted
    * under concurrent merge. Memory is (live windows) × d × 4096
    * no matter the corpus. */
  def cmsBuildWindowed(docs: DataFrame, winCol: String,
                       textCol: String): DataFrame =
    docs.select(col(winCol).cast("long").as("win"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("win", "w").agg(count(lit(1)).as("exact"))
      .select(col("win"), col("exact"), explode(jcArray(col("w"))).as("jc"))
      .groupBy(col("win"), col("jc.j").as("j"), col("jc.cell").as("cell"))
      .agg(sum(col("exact")).as("n"))

  /** Collapse the LIVE windows to one queryable sketch: cell-wise Σ
    * over exactly `liveWins` — by the CMS merge property this EQUALS
    * the rebuild over the live windows' corpus (the q297 gate's oracle
    * is that rebuild), so sliding the window is: append the new
    * window's table, drop the expired one, re-sum. */
  def cmsLive(windowed: DataFrame, liveWins: Seq[Long]): DataFrame =
    windowed.filter(col("win").isin(liveWins.map(x => x: Any): _*))
      .groupBy("j", "cell").agg(sum(col("n")).as("n"))

  /** DECAYED estimates over the per-window tables — exponential
    * forgetting in EXACT integers: a window aged `a` epochs weighs in at
    * n >> a (halving per epoch — the float λ·n decay is not
    * engine-exact; right-shift is). The decayed sketch is still a
    * cell-wise SUM of (shifted) per-window tables, so the monitor keeps
    * the q297 maintenance shape: advance the epoch by re-summing with
    * new ages, drop windows only when their weight shifts to zero.
    * Returns (w, exact, est, over) where `exact` is the DECAYED exact
    * count Σ_w (count_w >> age_w) — est ≥ exact still holds because
    * per-window CMS dominance survives shifting and summing. `docs`
    * must expose (`winCol`, textCol).
    *
    * Shift-domain guard: Spark's `shiftright` follows Java semantics
    * (shift amount masked mod 64), so a window aged ≥ 64 epochs — or an
    * invalid FUTURE window (win > curWin, a negative shift) — would
    * silently regain full weight instead of decaying to zero. Ages ≥ 64
    * are mathematically zero-weight (n < 2^64) and are FILTERED on both
    * engines; a future window is corrupt input and refuses DIRECTED. */
  def cmsDecayedEstimates(windowed: DataFrame, docs: DataFrame,
                          winCol: String, textCol: String,
                          curWin: Long): DataFrame = {
    def guardedAge(win: Column): Column =
      when(win > curWin, raise_error(concat(
        lit("cmsDecayedEstimates: window "), win.cast("string"),
        lit(s" is ahead of the current epoch $curWin — a negative " +
          "shift would wrap, not decay"))))
        .otherwise((lit(curWin) - win).cast("int"))
    val weighted = windowed
      .filter(col("win") > curWin - 64L)
      .select(col("j"), col("cell"),
        call_function("shiftright", col("n"), guardedAge(col("win")))
          .as("nw"))
      .groupBy("j", "cell").agg(sum(col("nw")).as("n"))
    val decayedExact = docs
      .select(col(winCol).cast("long").as("win"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .filter(col("win") > curWin - 64L)
      .groupBy("win", "w").agg(count(lit(1)).as("c"))
      .select(col("w"),
        call_function("shiftright", col("c"), guardedAge(col("win")))
          .as("cw"))
      .groupBy("w").agg(sum(col("cw")).as("exact"))
    decayedExact
      .select(col("w"), col("exact"), explode(jcArray(col("w"))).as("jc"))
      .join(broadcast(weighted),
        col("jc.j") === weighted("j") && col("jc.cell") === weighted("cell"),
        "left")
      .groupBy("w", "exact")
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
      .select(col("w"), col("exact"), col("est"),
        (col("est") - col("exact")).as("over"))
  }

  /** The q301 oracle: the decayed chain in SQL — per-window cells and
    * per-window exact counts both right-shifted by age, summed, min'd.
    * `source` must yield (win, text). */
  def cmsDecayedOracleSql(source: String, curWin: Long): String =
    s"""WITH src AS MATERIALIZED ($source),
       |pos AS (SELECT win, unnest(string_split(text, ' ')) AS w FROM src),
       |tw AS MATERIALIZED (
       |  SELECT win, w, CAST(count(*) AS BIGINT) AS c
       |  FROM pos WHERE len(w) > 0 GROUP BY 1, 2),
       |dexact AS MATERIALIZED (
       |  SELECT w, CAST(sum(c >> CAST($curWin - win AS INTEGER)) AS BIGINT)
       |    AS exact
       |  FROM tw WHERE win > $curWin - 64 GROUP BY 1),
       |wcells AS MATERIALIZED (
       |  SELECT j,
       |    substr(md5(CAST(j AS VARCHAR) || ':' || w), 1, $CmsNibbles) AS cell,
       |    win, CAST(sum(c) AS BIGINT) AS n
       |  FROM tw, LATERAL (SELECT unnest(range(0, $CmsDepth)) AS j) jj
       |  GROUP BY 1, 2, 3),
       |cells AS MATERIALIZED (
       |  SELECT j, cell,
       |    CAST(sum(n >> CAST($curWin - win AS INTEGER)) AS BIGINT) AS n
       |  FROM wcells WHERE win > $curWin - 64 GROUP BY 1, 2)
       |SELECT t.w, t.exact, min(c.n) AS est, min(c.n) - t.exact AS over
       |FROM dexact t, LATERAL (SELECT unnest(range(0, $CmsDepth)) AS j) jj
       |JOIN cells c ON c.j = jj.j
       |  AND c.cell = substr(md5(CAST(jj.j AS VARCHAR) || ':' || t.w), 1, $CmsNibbles)
       |GROUP BY t.w, t.exact""".stripMargin

  /** The whole chain in SQL — cells and estimates from the same
    * md5-prefix arithmetic. `source` must yield (text). */
  def cmsOracleSql(source: String): String =
    s"""WITH src AS MATERIALIZED ($source),
       |pos AS (SELECT unnest(string_split(text, ' ')) AS w FROM src),
       |tw AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS exact
       |  FROM pos WHERE len(w) > 0 GROUP BY 1),
       |cells AS MATERIALIZED (
       |  SELECT j, substr(md5(CAST(j AS VARCHAR) || ':' || w), 1, $CmsNibbles) AS cell,
       |         CAST(sum(exact) AS BIGINT) AS n
       |  FROM tw, LATERAL (SELECT unnest(range(0, $CmsDepth)) AS j) jj
       |  GROUP BY 1, 2)
       |SELECT t.w, t.exact, min(c.n) AS est, min(c.n) - t.exact AS over
       |FROM tw t, LATERAL (SELECT unnest(range(0, $CmsDepth)) AS j) jj
       |JOIN cells c ON c.j = jj.j
       |  AND c.cell = substr(md5(CAST(jj.j AS VARCHAR) || ':' || t.w), 1, $CmsNibbles)
       |GROUP BY t.w, t.exact""".stripMargin
}
