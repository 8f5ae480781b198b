package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** The [[UserState]] per-user profile on Spark 4's `transformWithState`
  * (SPARK-46815, the successor API to `flatMapGroupsWithState`): state is
  * a named, individually-encoded `ValueState` on a handle instead of one
  * opaque blob, TTL is declarative per state variable (no manual timeout
  * bookkeeping in the fold), and the runtime requires the RocksDB state
  * store provider — the configuration a large cluster runs anyway once
  * state exceeds executor heap.
  *
  * Kept alongside V1 deliberately: same transition function, same output
  * law (`TwsStateSpec` asserts V2 ≡ V1 over the same input), so the repo
  * documents BOTH the long-stable API and the current one. Scale shape is
  * unchanged — one small record per active user partitioned by key; TTL
  * bounds state by the active working set. */
object UserStateV2 {

  /** The V1 transition function as a StatefulProcessor: fold incoming
    * events into the per-user running profile held in a ValueState. */
  class ProfileProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[Long, UserEvent, UserProfile] {
    @transient private var profile: ValueState[UserProfile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttlConfig = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      profile = getHandle.getValueState[UserProfile]("profile",
        Encoders.product[UserProfile], ttlConfig)
    }

    override def handleInputRows(userId: Long, events: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserProfile] = {
      val prev = Option(profile.get()).getOrElse(
        UserProfile(userId, 0L, 0L, Long.MaxValue, Long.MinValue))
      val next = events.foldLeft(prev) { (p, e) =>
        p.copy(
          n_events = p.n_events + 1,
          n_clicks = p.n_clicks + (if (e.event_type == "click") 1 else 0),
          first_ts_ms = math.min(p.first_ts_ms, e.ts_ms),
          last_ts_ms = math.max(p.last_ts_ms, e.ts_ms))
      }
      profile.update(next)
      Iterator.single(next)
    }
  }

  /** Wire a streaming event frame into the stateful profile stream.
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (transformWithState's runtime contract).
    *
    * TimeMode follows the TTL: Spark's `validateTTLConfig` rejects any
    * non-zero TTL outside ProcessingTime mode
    * (StatefulProcessorCannotAssignTTLInTimeMode), so a TTL'd profile
    * stream runs in ProcessingTime mode and an un-TTL'd one in None. */
  def profiles(events: DataFrame,
      ttl: Option[java.time.Duration] = Some(java.time.Duration.ofHours(1))
      ): Dataset[UserProfile] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events.as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor(ttl),
        timeMode, OutputMode.Update())
  }
}
