package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization (SURVEY C35's custom-state form):
  * `flatMapGroupsWithState` over typed per-key state — the path for
  * session semantics `session_window()` cannot express (custom close
  * conditions, carried payloads, per-session caps). Complements c35
  * (lag+cumsum batch form) and c35b (the built-in operator).
  *
  * Scale design: one shuffle on the key (the groupByKey exchange);
  * state per key is a single fixed-size [[OpenSession]] however long
  * the session — memory is O(active keys), not O(events). Events
  * inside one invocation sort in memory: bounded by a key's per-batch
  * volume, the same contract the built-in session window holds.
  *
  * Sessions close when the gap between consecutive events EXCEEDS
  * `gapMicros` (strict, matching the c35 lag+cumsum gate) and are
  * reported as [min ts, last ts + gap) with an event count and value
  * sum.
  */
object Sessionize {

  case class Event(user_id: Long, tus: Long, value: Double)

  /** Streaming input row: the WATERMARKED timestamp column must flow
    * into the stateful operator itself (Spark's event-time-timeout
    * check rejects a plan whose watermark column was projected away),
    * so the streaming form carries `ts` and derives micros internally.
    */
  case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  case class OpenSession(start: Long, last: Long, n: Long, sum: Double)

  case class Session(
      user_id: Long,
      session_start: Long,
      session_end: Long,
      n: Long,
      sv: Double)

  private def close(userId: Long, s: OpenSession, gapMicros: Long): Session =
    Session(userId, s.start, s.last + gapMicros, s.n, s.sum)

  /** The state transition shared by the batch and streaming forms:
    * fold this invocation's (sorted) events into the open session,
    * emitting every session a gap closes. Returns (closed sessions,
    * still-open tail).
    */
  private def fold(
      userId: Long,
      events: Seq[Event],
      open0: Option[OpenSession],
      gapMicros: Long): (List[Session], Option[OpenSession]) = {
    var closed = List.empty[Session]
    var open = open0
    events.foreach { e =>
      open = open match {
        case Some(s) if e.tus - s.last > gapMicros =>
          closed ::= close(userId, s, gapMicros)
          Some(OpenSession(e.tus, e.tus, 1, e.value))
        case Some(s) =>
          // an out-of-order (late but in-watermark) event can precede
          // the open session's start — the reported [min ts, ...) must
          // include it
          Some(s.copy(start = math.min(s.start, e.tus),
            last = math.max(s.last, e.tus), n = s.n + 1,
            sum = s.sum + e.value))
        case None =>
          Some(OpenSession(e.tus, e.tus, 1, e.value))
      }
    }
    (closed.reverse, open)
  }

  /** Batch form: every session closes at end-of-data (the bounded
    * input IS the complete history), so the trailing open session
    * emits too — total parity with the lag+cumsum formulation.
    */
  def sessionsBatch(events: Dataset[Event], gapMicros: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, it) =>
      val (closed, open) =
        fold(userId, it.toSeq.sortBy(e => (e.tus, e.value)), None, gapMicros)
      (closed ++ open.map(close(userId, _, gapMicros))).iterator
    }
  }

  /** Streaming form: open sessions live in [[GroupState]] and close
    * either by an in-batch gap or by event-time timeout once the
    * watermark passes `last + gap` — late data beyond the watermark is
    * the source's contract, exactly as with the built-in
    * `session_window`. Use with `OutputMode.Append`.
    */
  def sessionsStream(
      events: Dataset[TimedEvent],
      gapMicros: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[TimedEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(userId, _, gapMicros))
            state.remove()
            out.iterator
          } else {
            val (closed, open) = fold(userId,
              it.map(e => Event(e.user_id, micros(e.ts), e.value))
                .toSeq.sortBy(e => (e.tus, e.value)), state.getOption,
              gapMicros)
            open match {
              case Some(s) =>
                state.update(s)
                // fires when the watermark passes the session's close
                // boundary — the earliest moment no on-time event can
                // extend it. A boundary already behind the watermark
                // (late-data session) times out at the next tick: the
                // API requires a timestamp strictly above the current
                // watermark.
                state.setTimeoutTimestamp(math.max(
                  (s.last + gapMicros) / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
