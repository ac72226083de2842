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

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(startMs: Long, endMs: Long, nEvents: Long)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

  /**
   * Event-time sessionization with a `gap` inactivity timeout: consecutive
   * events of a user closer than `gap` form one session. Sessions close
   * either when a later event arrives past the gap (emitted immediately) or
   * when the event-time watermark passes `end + gap` (event-time timeout —
   * no more in-gap events can exist). Per-key state is one small struct.
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
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val done = toSession(user, state.get)
            state.remove()
            Iterator.single(done)
          } else {
            // Merge the stored session (as an interval) with the batch's
            // events in start order — valid late events that precede the
            // stored session form/extend EARLIER sessions instead of being
            // absorbed into the wrong start. All but the last session close
            // now (their extensions would be behind them in event time);
            // the last stays open in state.
            val items: Array[(Long, Long, Long)] =
              (evs.map(e => (e.ts.getTime, e.ts.getTime, 1L)).toArray ++
                state.getOption.map(s => (s.startMs, s.endMs, s.nEvents)))
                .sortBy(x => (x._1, x._2))
            var closed = List.empty[Session]
            var cur: Option[SessionState] = None
            items.foreach { case (st, en, n) =>
              cur match {
                case Some(s) if st <= s.endMs + gapMs =>
                  cur = Some(SessionState(s.startMs, math.max(s.endMs, en), s.nEvents + n))
                case Some(s) =>
                  closed ::= toSession(user, s)
                  cur = Some(SessionState(st, en, n))
                case None =>
                  cur = Some(SessionState(st, en, n))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close via event-time timeout once no in-gap event can exist
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverseIterator
          }
        })
  }
}
