package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot maintenance: MERGE a daily batch (updates + inserts)
  * into a persisted snapshot keyed by document id — the upsert loop every
  * continuously-ingested training corpus runs between crawls, sitting next
  * to [[Dedup.incrementalNearDupsAgainstIndex]] (content arrival) and the
  * q133 band-index maintenance (index arrival) as the third leg of the
  * daily cycle: the CONTENT table itself.
  *
  * Semantics (classic upsert with version lineage): a batch row whose key
  * exists in the snapshot REPLACES the payload and bumps the version; a
  * batch row with a new key INSERTS at version 1; snapshot rows the batch
  * does not touch carry through unchanged. No deletes — a curation
  * pipeline tombstones by quality flag (q90), it does not lose lineage.
  *
  * Scale shape: the snapshot lives in a [[graft.sources.BucketedTap]]
  * bucketed by the key, so the merge's full-outer sort-merge join plans
  * with NO exchange on the snapshot side — only the (small) daily batch
  * shuffles, into the snapshot's own bucket layout (the q127/q72
  * discipline, plan-asserted inside the q142 gate). Writing the merged
  * result back through the same tap restores the invariant for tomorrow;
  * at 100 TB the snapshot pays its layout shuffle once at bootstrap and
  * never re-shuffles on any later day. Bucket count is the file-size
  * knob: size one bucket ≈ one task.
  *
  * Reference anchor: the reference's closest surface is SinkMode.UPDATE
  * on a tap (`SinkMode` handling in the platform's tap wiring), which
  * blind-appends; keyed replace-or-insert with version lineage requires
  * the join this operator owns. */
object Snapshot {

  /** The tap a snapshot is persisted through: bucketed by the merge key. */
  def snapshotTap(table: String, buckets: Int, key: String): graft.sources.BucketedTap =
    graft.sources.BucketedTap(table, buckets, Seq(key))

  /** Blue/green snapshot publication for a STREAMING merge loop: each
    * micro-batch upserts into the live snapshot version and writes the
    * result as the OTHER table of an A/B pair in the same bucketed layout
    * — readers always see a complete published version, never a half-
    * written one, and the merge join keeps the zero-snapshot-side-exchange
    * plan every cycle (both tables share the layout). This is the
    * copy-on-write publication model; at 100 TB the per-batch rewrite cost
    * is the COW trade (amortize with partition-scoped rewrites when batch
    * keys cluster — the layout supports it, the loop doesn't need to
    * change).
    *
    * `applyBatch` is idempotent per Structured Streaming batchId within a
    * run (replayed ids are skipped — the standard foreachBatch guard; a
    * restart-surviving guard would persist the last applied id with the
    * published version, same discipline). */
  final class PingPong(s: org.apache.spark.sql.SparkSession, base: String,
                       buckets: Int, key: String, payload: Seq[String],
                       versionCol: String) extends Serializable {
    private val tables = Vector(s"${base}_a", s"${base}_b")
    @volatile private var cur = 0
    @volatile private var lastApplied = -1L
    private def tap(t: String) = snapshotTap(t, buckets, key)
    def bootstrap(df: DataFrame): Unit = {
      tables.foreach(graft.queries.Tables.dropStagedTable(s, _))
      tap(tables(cur)).write(df, graft.sources.SinkMode.Replace)
    }
    def live: DataFrame = s.table(tables(cur))
    def applyBatch(batch: DataFrame, batchId: Long): Unit =
      if (batchId > lastApplied) {
        val next = 1 - cur
        tap(tables(next)).write(
          upsert(live, batch, key, payload, versionCol),
          graft.sources.SinkMode.Replace)
        cur = next
        lastApplied = batchId
      }
  }

  /** Change-data capture between two snapshot versions: one row per key
    * whose state differs, tagged `insert` (only in `newer`), `delete`
    * (only in `older`) or `update` (payload differs); unchanged keys are
    * dropped. Output: (key, change, payload... from the surviving side —
    * the newer side except for deletes).
    *
    * Scale shape: when both versions are persisted through the SAME
    * [[snapshotTap]] layout (same key, same bucket count — the natural
    * state of yesterday's and today's snapshot), the full-outer comparison
    * plans with ZERO exchanges: both sides are bucket-aware scans and the
    * sort-merge join runs entirely within co-located buckets (asserted in
    * the q145 gate). A 100 TB snapshot pair diffs for the cost of reading
    * it — no shuffle at all. */
  def diff(older: DataFrame, newer: DataFrame, key: String,
           payload: Seq[String]): DataFrame = {
    val n = newer.select(col(key).as("n_key") +:
      payload.map(c => col(c).as(s"n_$c")): _*)
    val changed = payload
      .map(c => !(col(c) <=> col(s"n_$c")))
      .reduce(_ || _)
    older.join(n, col(key) === col("n_key"), "full_outer")
      .withColumn("change",
        when(col(key).isNull, lit("insert"))
          .when(col("n_key").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change").isNotNull)
      .select(coalesce(col(key), col("n_key")).as(key) +: col("change") +:
        payload.map(c => when(col("change") === "delete", col(c))
          .otherwise(col(s"n_$c")).as(c)): _*)
  }

  /** Merge `batch` into `snapshot`. Both carry `key` and `payload` columns;
    * `snapshot` additionally carries bigint `versionCol`. Output schema is
    * snapshot's: (key, payload..., versionCol). Keys must be non-null
    * (they drive the outer-join match test); payload values may be null —
    * a batch row's null payload REPLACES (the match is decided by the key,
    * not coalesce over the payload). */
  def upsert(snapshot: DataFrame, batch: DataFrame, key: String,
             payload: Seq[String], versionCol: String): DataFrame = {
    val b = batch.select(col(key).as("b_key") +:
      payload.map(c => col(c).as(s"b_$c")): _*)
    snapshot.join(b, col(key) === col("b_key"), "full_outer")
      .select(
        coalesce(col(key), col("b_key")).as(key) +:
          payload.map(c => when(col("b_key").isNotNull, col(s"b_$c"))
            .otherwise(col(c)).as(c)) :+
          when(col("b_key").isNull, col(versionCol))             // untouched
            .when(col(key).isNull, lit(1L))                      // insert
            .otherwise(col(versionCol) + 1L)                     // update
            .as(versionCol): _*)
  }
}
