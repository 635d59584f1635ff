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
