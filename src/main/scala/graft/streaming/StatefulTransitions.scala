package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user event-transition extraction as a STATEFUL streaming operator
  * (`flatMapGroupsWithState`): state is ONE row per user — the last seen
  * event — so a (prev, next) transition is emitted the moment the next
  * event arrives, including across micro-batch boundaries. This is the
  * incremental shape of `q_events_markov`'s batch lag-window: at 100 TB
  * of events the batch job re-reads history every refresh, while this
  * keeps memory bounded by ACTIVE USERS (one tiny state row each) and
  * work bounded by the new batch.
  *
  * Exactness: within a batch, each user's rows are sorted by
  * (ts, event_id) — the batch window's exact order; across batches the
  * caller must deliver a user's events in non-decreasing time order
  * (true for commit-ordered table streams whose commits partition event
  * time). Under that contract the emitted transition multiset is
  * IDENTICAL to the batch lag-window's, which is what the
  * `stream_markov` oracle asserts. */
object StatefulTransitions {

  case class Ev(user_id: Long, event_id: Long, tsUs: Long, event_type: String)

  case class LastEv(tsUs: Long, event_id: Long, event_type: String)

  case class Transition(user_id: Long, prev_type: String, next_type: String)

  def step(
      userId: Long,
      rows: Iterator[Ev],
      state: GroupState[LastEv]): Iterator[Transition] = {
    val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.event_id))
    var last = state.getOption.orNull
    val out = Seq.newBuilder[Transition]
    sorted.foreach { e =>
      if (last != null) out += Transition(userId, last.event_type, e.event_type)
      last = LastEv(e.tsUs, e.event_id, e.event_type)
    }
    if (last != null) state.update(last)
    out.result().iterator
  }

  /** `events` must have user_id, event_id, event_type and a `ts_us`
    * micros column. Returns the per-user transition stream. */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr(
        "CAST(user_id AS BIGINT) AS user_id",
        "CAST(event_id AS BIGINT) AS event_id",
        "CAST(ts_us AS BIGINT) AS tsUs",
        "CAST(event_type AS STRING) AS event_type")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(step)
  }
}
