package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization as a STATEFUL streaming operator
  * (`flatMapGroupsWithState`): per-user state carries the open session
  * across micro-batches; a session is emitted the moment a later event
  * proves it closed (gap > `gapUs`). The engine shuffles by user once per
  * batch and state lives in the state store — at 100 TB of events this is
  * the incremental shape of `q_events_sessions`' window-function batch
  * job, with memory bounded by ACTIVE users, not history.
  *
  * Each user's final (still-open) session is intentionally never emitted:
  * with unbounded input it is not closed yet. */
object StatefulSessions {

  case class Event(user_id: Long, event_id: Long, tsUs: Long)

  case class OpenSession(startUs: Long, lastUs: Long, n: Long, idx: Long)

  case class ClosedSession(
      user_id: Long,
      session_idx: Long,
      n_events: Long,
      session_start_us: Long,
      session_end_us: Long)

  /** close-on-gap transition; batch rows sorted by (ts, event_id) so
    * replays are deterministic */
  def step(gapUs: Long)(
      userId: Long,
      rows: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.event_id))
    var open = state.getOption.orNull
    val out = Seq.newBuilder[ClosedSession]
    sorted.foreach { e =>
      open match {
        case null =>
          open = OpenSession(e.tsUs, e.tsUs, 1L, 1L)
        case s if e.tsUs < s.startUs =>
          // cross-batch late arrival predating the open session: it may
          // belong to an already-emitted session — dropping keeps the
          // invariant start <= counted events <= last (streaming late
          // data, same stance as a watermark would take)
          ()
        case s if e.tsUs - s.lastUs > gapUs =>
          out += ClosedSession(userId, s.idx, s.n, s.startUs, s.lastUs)
          open = OpenSession(e.tsUs, e.tsUs, 1L, s.idx + 1L)
        case s =>
          open = s.copy(lastUs = math.max(s.lastUs, e.tsUs), n = s.n + 1L)
      }
    }
    if (open != null) state.update(open)
    out.result().iterator
  }

  /** `events` must have user_id, event_id and a `ts_us` micros column.
    * Returns the closed-session stream. */
  def sessions(events: DataFrame, gapUs: Long): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr(
        "CAST(user_id AS BIGINT) AS user_id",
        "CAST(event_id AS BIGINT) AS event_id",
        "CAST(ts_us AS BIGINT) AS tsUs")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(step(gapUs))
  }
}
