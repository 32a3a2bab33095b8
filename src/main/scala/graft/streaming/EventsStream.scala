package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Stateful streaming over an event feed — the capabilities a
  * training-data/analytics pipeline needs beyond the reference's
  * stateless MV (SURVEY §2.8 maps the reference; these are the
  * engine-level extensions: event-time windows with watermarks, and
  * custom session state via flatMapGroupsWithState).
  *
  * Scale notes:
  *  - the windowed aggregate is a streaming partial→final hash agg keyed
  *    by (window, event_type): state size is O(open windows × types),
  *    bounded by the watermark, and shuffles only group deltas;
  *  - sessionization state is per-user and evicted by event-time
  *    timeout, so state growth is O(active users in gap window), not
  *    O(stream length);
  *  - both run identically under Trigger.AvailableNow (batch-equivalent
  *    catch-up) and a continuous trigger.
  */
/** Open-session accumulator for [[EventsStream.sessionize]] — top-level
  * (not nested/private) so the state encoder's generated code links.
  */
final case class SessionState(start: Long, end: Long, n: Long, total: Double)

object EventsStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("ts", StringType), // ISO instant in the feed
  ))

  final case class Event(user_id: Long, event_id: Long, event_type: String,
      value: Double, ts: Timestamp)

  final case class SessionSummary(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** value:String JSON lines → typed events (malformed rows dropped —
    * unlike the track MV, an analytics feed wants dirty rows OUT, and
    * the filter is the explicit, tested policy).
    */
  def parse(values: DataFrame): Dataset[Event] = {
    val spark = values.sparkSession
    import spark.implicits._
    values
      .select(from_json(col("value"), eventSchema).as("e"))
      .select(col("e.user_id"), col("e.event_id"), col("e.event_type"),
        col("e.value"), col("e.ts").try_cast(TimestampType).as("ts"))
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .as[Event]
  }

  /** Event-time tumbling-window aggregate with a watermark: 5-minute
    * windows per event_type, 10-minute lateness bound. Append mode —
    * a window row is emitted exactly once, when the watermark passes
    * its end (deterministic, replayable).
    */
  def windowedCounts(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Custom session state: per-user sessions closed by a 30-minute
    * event-time gap. flatMapGroupsWithState with EventTimeTimeout —
    * state evicts itself when the watermark passes last-event + gap,
    * emitting the closed session.
    *
    * `gapMinutes` must be >= the watermark delay: an event later than
    * the gap but inside the watermark would otherwise merge into a
    * session that a gap-first ordering would have closed.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionSummary] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionSummary(userId, new Timestamp(s.start),
          new Timestamp(s.end), s.n, s.total))
      } else {
        // fold the micro-batch's rows into sessions, emitting any that a
        // gap closes inside the batch; keep the trailing one in state
        val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var cur = state.getOption
        val closed = Seq.newBuilder[SessionSummary]
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              // min() start: a late in-watermark event can precede the
              // session's current start when batches arrive out of order
              cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                s.n + 1, s.total + e.value))
            case Some(s) =>
              closed += SessionSummary(userId, new Timestamp(s.start),
                new Timestamp(s.end), s.n, s.total)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // clamp above the current watermark: a very late event (older
          // than watermark - gap) would otherwise compute a timeout at or
          // before the watermark, which Spark rejects with an
          // IllegalArgumentException and kills the query
          state.setTimeoutTimestamp(
            math.max(s.end + gapMs, state.getCurrentWatermarkMs + 1))
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Streaming exact dedup: drop re-deliveries of the same event_id
    * arriving within the watermark horizon. The state store holds only
    * ids inside the horizon (evicted beyond it) — the streaming rung of
    * the dedup ladder: bounded state, no full-history key set.
    */
  def dedupedEvents(events: Dataset[Event]): Dataset[Event] =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** STREAM-STREAM interval join: attribute each purchase to the views
    * by the same user within the preceding `windowMinutes`. Both sides
    * carry watermarks and the join condition bounds event-time on both
    * sides, so Spark can evict buffered state once the watermark
    * passes the interval — state is O(events inside the window), not
    * O(stream history). This is the engine capability the reference's
    * stateless MV never needed and a behavioral-analytics pipeline
    * always does.
    *
    * Batch-gated as `st_attribution` (StreamingGates) — identical
    * relational semantics; EventsStreamSpec asserts stream/batch
    * parity on the fixture.
    */
  def attribution(events: Dataset[Event], windowMinutes: Int = 30): DataFrame = {
    val views = events.toDF()
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val purchases = events.toDF()
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    purchases.join(views,
      col("user_id") === col("p_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        col("purchase_ts"), col("view_ts"))
  }

  /** Run a streaming stage to a checkpointed parquet sink, AvailableNow. */
  def runToParquet(out: DataFrame, tablePath: String, checkpoint: String): StreamingQuery =
    out.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", tablePath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
