package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Event-time stateful streaming — the Structured-Streaming surface beyond
 * Flush-driven appends ([[Incremental]]): watermarked windowed aggregation
 * and custom session state via `flatMapGroupsWithState`. The reference's
 * streaming layer has no event-time notion (its poll loop is arrival-time
 * only, reference nodestream/pipeline/extractors/streams/extractor.py:47-99);
 * these are the operators a training-data event pipeline needs at scale —
 * state is partitioned by key across executors and checkpointed by the
 * engine, so a 1000-executor job holds billions of keys.
 */
object Stateful {

  /** Watermarked tumbling-window counts in append mode: a window emits once
    * the event-time watermark passes its end — late events beyond
    * `watermarkDelay` are dropped, bounding state. */
  def windowedCounts(
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      watermarkDelay: String,
      windowDuration: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col(keyCol), col("cnt"))

  /** Exactly-once streaming dedup: the first arrival of a key is emitted
    * immediately (append mode), re-deliveries are dropped while the key's
    * state lives. Keyed state is scoped by the event-time watermark —
    * `dropDuplicatesWithinWatermark` evicts a key once the watermark passes
    * its event time + `watermarkDelay`, so state is bounded by the
    * re-delivery horizon (an at-least-once bus re-sends within minutes, not
    * days), NOT by stream length: the property that makes streaming ingest
    * dedup viable over unbounded streams on a 1000-executor cluster. */
  def streamingDedup(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(startMs: Long, endMs: Long, nEvents: Long)
  final case class SessionsState(sessions: Seq[SessionState])
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

  /**
   * Event-time sessionization with a `gap` inactivity timeout: consecutive
   * events of a user closer than `gap` form one session. State holds ALL of
   * a key's open sessions (a short disjoint interval list — gap-separated
   * sessions inside the watermark horizon), and a session is emitted only
   * once the watermark passes `end + gap`: that is the earliest moment it is
   * PROVABLY closed. Emitting earlier — e.g. as soon as a later out-of-gap
   * event shows up — is unsound in append mode: a still-valid late event
   * landing inside the emitted session's gap would then surface as a
   * phantom second session that cannot be retracted. Correctness of the
   * emission rule: an event that could extend (ts ≤ end + gap ≤ watermark)
   * or precede (ts < start ≤ watermark) an emitted session would itself be
   * below the watermark, and the engine drops sub-watermark rows before
   * they reach the state function.
   */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long,
      watermarkDelay: String): Dataset[Session] = {
    import events.sparkSession.implicits._

    def toSession(user: Long, s: SessionState): Session =
      Session(user, new Timestamp(s.startMs), new Timestamp(s.endMs), s.nEvents)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[Event], state: GroupState[SessionsState]) => {
          val wm = state.getCurrentWatermarkMs()
          // Merge the batch's events into the stored disjoint session list
          // in start order — valid late events that precede a stored
          // session form/extend EARLIER sessions instead of being absorbed
          // into the wrong start. (Also handles the timed-out invocation:
          // evs is empty and the partition below does the emission.)
          val items =
            (evs.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L)).toSeq ++
              state.getOption.map(_.sessions).getOrElse(Seq.empty))
              .sortBy(s => (s.startMs, s.endMs))
          var merged = List.empty[SessionState]
          items.foreach { s =>
            merged = merged match {
              case h :: t if s.startMs <= h.endMs + gapMs =>
                SessionState(h.startMs, math.max(h.endMs, s.endMs), h.nEvents + s.nEvents) :: t
              case other => s :: other
            }
          }
          val (closed, open) = merged.reverse.partition(_.endMs + gapMs <= wm)
          if (open.nonEmpty) {
            state.update(SessionsState(open))
            // fire when the watermark passes the EARLIEST possible close;
            // open sessions have endMs + gap > wm, so the timestamp is
            // legal (strictly ahead of the current watermark)
            state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs)
          } else state.remove()
          closed.iterator.map(toSession(user, _))
        })
  }
}
