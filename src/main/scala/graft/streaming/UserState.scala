package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input: one click-ish event keyed by user. */
case class UserEvent(user_id: Long, event_type: String, ts_ms: Long)

/** Per-user running profile maintained in the state store. */
case class UserProfile(user_id: Long, n_events: Long, n_clicks: Long,
    first_ts_ms: Long, last_ts_ms: Long)

/** Custom keyed state (SURVEY §2.8 T4 extension): a per-user running
  * profile via `flatMapGroupsWithState` — the escape hatch when built-in
  * aggregations can't express the state transition (here: monotone
  * first/last timestamps + conditional counters, emitted on every
  * update).
  *
  * Scale: state is one small record per active user, partitioned by the
  * grouping key across executors; processing-time timeout evicts idle
  * users so state is bounded by the active-user working set, not history.
  */
object UserState {

  def updateProfile(evictAfter: Option[String])(
      userId: Long,
      events: Iterator[UserEvent],
      state: GroupState[UserProfile]): Iterator[UserProfile] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val prev = state.getOption.getOrElse(
        UserProfile(userId, 0L, 0L, Long.MaxValue, Long.MinValue))
      val next = events.foldLeft(prev) { (p, e) =>
        p.copy(
          n_events = p.n_events + 1,
          n_clicks = p.n_clicks + (if (e.event_type == "click") 1 else 0),
          first_ts_ms = math.min(p.first_ts_ms, e.ts_ms),
          last_ts_ms = math.max(p.last_ts_ms, e.ts_ms))
      }
      state.update(next)
      evictAfter.foreach(state.setTimeoutDuration)
      Iterator.single(next)
    }
  }

  /** Wire a streaming (or batch) event frame into the stateful profile
    * stream. Output mode for streaming: Update.
    *
    * `evictAfter = Some(d)` enables processing-time eviction of idle
    * users (production default). Note the cost model: with timeouts on,
    * the engine runs timer micro-batches continuously even without data —
    * correct on a cluster, but pair it with a real ProcessingTime trigger
    * so the timer batches amortize. */
  def profiles(events: DataFrame,
      evictAfter: Option[String] = Some("1 hour")): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (evictAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), timeoutConf)(
        updateProfile(evictAfter))
  }
}
