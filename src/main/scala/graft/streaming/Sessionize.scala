package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization over the event stream — the custom-state
  * streaming operator the reference's domain implies (user_session
  * analysis) but its batch stack can't express incrementally.
  *
  * `flatMapGroupsWithState` keyed by user: events extend an open session
  * until `gapSeconds` of silence; the session is emitted on timeout (or
  * stream end). State per key is one small case class — bounded by active
  * users, the canonical scale profile for this operator.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, event_time: Timestamp, event_type: String)

  final case class SessionState(start: Long, end: Long, events: Int, purchases: Int)

  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Int,
                               n_purchases: Int, duration_sec: Long)

  /** Pure state-transition function (shared by the streaming operator and
    * the batch test harness — deterministic, no wall-clock access). */
  def updateState(userId: Long, events: Iterator[SessionEvent],
                  state: GroupState[SessionState],
                  gapSeconds: Long): Iterator[UserSession] = {
    val sorted = events.toSeq.sortBy(_.event_time.getTime)
    var closed = List.empty[UserSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.event_time.getTime
      cur match {
        case Some(s) if t - s.end <= gapSeconds * 1000 =>
          // min/max, not assignment: a late (within-watermark) event must
          // not regress the session end below its start.
          cur = Some(s.copy(start = math.min(s.start, t), end = math.max(s.end, t),
            events = s.events + 1,
            purchases = s.purchases + (if (e.event_type == "purchase") 1 else 0)))
        case Some(s) =>
          closed ::= toSession(userId, s)
          cur = Some(SessionState(t, t, 1, if (e.event_type == "purchase") 1 else 0))
        case None =>
          cur = Some(SessionState(t, t, 1, if (e.event_type == "purchase") 1 else 0))
      }
    }
    if (state.hasTimedOut) {
      val out = cur.map(toSession(userId, _)).toList ::: closed
      state.remove()
      out.reverseIterator
    } else {
      cur.foreach { s =>
        state.update(s)
        // Register the close-on-silence timeout every batch (an idle key is
        // only re-invoked by its timeout — skipping registration in the
        // first, watermark-0 batch would leave the session open forever).
        // Clamp above the watermark: setTimeoutTimestamp rejects the past.
        state.setTimeoutTimestamp(
          math.max(s.end + gapSeconds * 1000, state.getCurrentWatermarkMs() + 1))
      }
      closed.reverseIterator
    }
  }

  private def toSession(userId: Long, s: SessionState): UserSession =
    UserSession(userId, new Timestamp(s.start), new Timestamp(s.end),
      s.events, s.purchases, (s.end - s.start) / 1000)

  /** Streaming sessionization: watermarked event-time state with per-key
    * timeouts. Input must carry (user_id, event_time, event_type). */
  def sessions(spark: SparkSession, events: Dataset[SessionEvent],
               gapSeconds: Long = 1800): Dataset[UserSession] = {
    import spark.implicits._
    events
      .withWatermark("event_time", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (k: Long, it: Iterator[SessionEvent], st: GroupState[SessionState]) =>
          updateState(k, it, st, gapSeconds))
  }
}
