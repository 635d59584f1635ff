package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming variants of the engine's aggregation operators.
  *
  * The reference is batch-only (Flink DataSet API, no DataStream —
  * SURVEY.md §2.8), so everything here is extension surface: the same
  * logical ops (`Each` → select/filter, windowed `GroupBy`+`Every` →
  * watermark + window agg, sessionization → `flatMapGroupsWithState`)
  * expressed against an unbounded source.
  */
object StreamOps {

  /** Open a file-backed stream with an explicit schema (streaming sources
    * cannot infer). */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Tumbling event-time window aggregation with a watermark for state
    * eviction — the streaming form of the batch q31 window query. State is
    * bounded by (watermark horizon / window size) × key cardinality. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, watermark: String,
                     valueCol: Option[String] = Some("value")): DataFrame = {
    val base = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col(keyCol))
    val out = valueCol match {
      case Some(v) => base.agg(count(lit(1)).as("n"),
        // exact int128-micros kernel: value-identical to the decimal(38,6)
        // sum, and its two-long buffer keeps streaming state compact
        graft.catalyst.ExactMicrosSum.sum(col(v)).as("sum_value"))
      case None => base.agg(count(lit(1)).as("n"))
    }
    out.select(col("w.start").as("w_start") +: col(keyCol) +: col("n") +:
      valueCol.toSeq.map(_ => col("sum_value")): _*)
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, start_ts: java.sql.Timestamp,
                        end_ts: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Gap-based sessionization with custom state — the streaming counterpart
    * of the batch q29 query. A session closes when a later event for the
    * same key arrives beyond the gap; with `ProcessingTimeTimeout` it also
    * closes after `gapSeconds` of silence (note: timeout mode makes the
    * micro-batch engine schedule continuous timeout-check batches — use
    * `NoTimeout` for deterministic replay/testing). */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
                 gapSeconds: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (userId: Long, evs: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.sum))
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(gapSeconds * 1000)
            }
            closed.reverseIterator
          }
        })
  }

  /** Watermarked stream-stream inner join: each left event matches right
    * events for the same key whose timestamp falls in
    * `[leftTs - maxDelaySeconds, leftTs]` — the streaming form of the as-of
    * family (enrich purchases with recent views). Both sides carry
    * watermarks plus the time-range condition, which is what lets Spark
    * evict join state — without the range bound, state grows forever. Column
    * names must be disjoint apart from the key. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       watermark: String, maxDelaySeconds: Long): DataFrame = {
    require((left.columns.toSet & right.columns.toSet).isEmpty,
      "stream-stream join requires disjoint column names; rename first")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r, expr(
      s"""$leftKey = $rightKey AND
         |$rightTs >= $leftTs - INTERVAL $maxDelaySeconds SECONDS AND
         |$rightTs <= $leftTs""".stripMargin), "inner")
  }

  /** Streaming exact dedup: drop documents whose normalized content hash
    * was already seen, with state bounded by the watermark horizon — the
    * streaming form of `Dedup.exactDedup` for continuous ingestion
    * pipelines. */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
                  watermark: String): DataFrame =
    docs
      .withColumn("__content_hash",
        graft.functions.Dedup.contentHash(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")

  /** Run a streaming query into an in-memory table and block until the
    * available data is fully processed (test/driver harness). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
