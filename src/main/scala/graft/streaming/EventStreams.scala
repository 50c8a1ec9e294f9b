package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the driver's `events` table shape (TESTDATA.md). */
final case class EventRow(
    event_id: Long,
    ts: Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** A closed user session emitted by [[EventStreams.sessionize]]. */
final case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_value: Double)

/** Open-session accumulator kept in the state store between triggers. */
final case class SessionState(
    startMs: Long,
    endMs: Long,
    n: Long,
    total: Double)

/** Structured Streaming surface over event streams (builder brief; beyond
  * the reference — acowley/Frames "streaming" is finite single-threaded
  * pipes with no event time, SURVEY §2.10).
  *
  * Every transform here is the SAME declarative plan for batch and
  * streaming input — pass `spark.read.parquet(...)` and it runs as a
  * batch query, pass `spark.readStream...` and Spark runs it
  * incrementally with state in the checkpointed state store. Watermarks
  * bound state size (without one, a 100 TB/day stream grows state
  * forever); aggregations shuffle once on their keys exactly like the
  * batch equivalents.
  */
object EventStreams {

  /** Tumbling event-time window aggregate per event type, watermark-bounded.
    * Streaming: partial aggregation happens map-side per trigger, the
    * state store holds one row per (window, type) — O(windows x types),
    * independent of event volume. */
  def windowedCounts(
      events: DataFrame,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Built-in session windows (gap-based), the declarative sessionization:
    * prefer this when the per-session result is a plain aggregate — the
    * native state store implementation merges/expires sessions without
    * user code. */
  def sessionWindowAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes",
      totalValue: org.apache.spark.sql.Column => org.apache.spark.sql.Column = sum(_)): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), totalValue(col("value")).as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Streaming exact dedup on content identity (e.g. a document
    * fingerprint column) — state holds one key per distinct id seen
    * within the watermark horizon, then expires. The streaming face of
    * `graft.operators.Dedup.exact`. */
  def streamingDedup(
      events: DataFrame,
      keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Custom-state sessionization via `flatMapGroupsWithState` — for when
    * session emission logic is richer than an aggregate (here: emit each
    * CLOSED session exactly once, carrying count + value totals; the open
    * session rides in the state store with an event-time timeout at
    * `end + gap`, so state per user is O(1) and expires by watermark).
    *
    * Requires a streaming Dataset with a watermark on `ts`
    * (EventTimeTimeout contract). Use [[sessionWindowAgg]] for the
    * batch/declarative form.
    */
  def sessionize(
      events: Dataset[EventRow],
      gapMs: Long = 30L * 60 * 1000): Dataset[UserSession] = {
    implicit val sessEnc: Encoder[UserSession] = Encoders.product[UserSession]
    implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's end + gap: close it
            val s = state.get
            state.remove()
            Iterator.single(
              UserSession(userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total))
          } else {
            // merge this trigger's events (per-group, already co-located;
            // sort is bounded by the trigger's batch for this user)
            val sorted = rows.toArray.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  open = Some(SessionState(s.startMs, math.max(s.endMs, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += UserSession(
                    userId, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.total)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.endMs + gapMs)
              case None => ()
            }
            closed.result().iterator
          }
      }
  }
}
