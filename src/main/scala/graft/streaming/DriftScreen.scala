package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One closed per-key period count arriving on the stream (in
  * production: the output of a watermark-closed daily window agg). */
case class PeriodCount(event_type: String, day: Long, cnt: Long)

/** One CUSUM step: the detector state after folding `day`, plus the
  * drift flag against the decision threshold h. */
case class DriftRow(event_type: String, day: Long, cnt: Long,
    cusum_pos: Long, cusum_neg: Long, drift: Boolean)

/** Streaming CUSUM drift detector — the live half of the batch
  * `ref_cusum_shift` screen (Page 1954): per-key S⁺/S⁻ shift statistics
  * maintained incrementally as period counts close, flagging when either
  * side crosses the decision interval h. This is where CUSUM's O(1)
  * state pays off: the batch query folds the whole calendar, the stream
  * carries TWO LONGS per key in the state store and updates them once
  * per closed period — the canonical "model trained on history, applied
  * to the live feed" split (reference targets `k` come from a batch
  * profile of history, exactly like AnomalyScreen's stats side).
  *
  * Determinism contract: the recursion is all-integer (targets are
  * integer reference levels), so stream and batch agree BIT-FOR-BIT on
  * any prefix — asserted as the stream==batch law in DriftScreenSpec.
  * Periods inside one micro-batch fold in day order; an out-of-order
  * period older than the last folded day is dropped (the upstream
  * watermark-closed window agg guarantees in-order closes; a dropped
  * period is the honest semantics, not silent misfolding).
  *
  * Scale: state is |keys| × 3 longs, partitioned by key; each closed
  * period costs one state-store read-modify-write. No shuffle beyond
  * the groupByKey the upstream window agg already required.
  */
object DriftScreen {

  case class CusumState(lastDay: Long, pos: Long, neg: Long)

  private[streaming] def step(targets: Map[String, Long], h: Long)(
      key: String,
      rows: Iterator[PeriodCount],
      state: GroupState[CusumState]): Iterator[DriftRow] = {
    val k = targets.getOrElse(key, 0L)
    var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0L, 0L))
    val out = rows.toSeq.sortBy(_.day).iterator.flatMap { p =>
      if (p.day <= st.lastDay) Iterator.empty // late close: see scaladoc
      else {
        st = CusumState(p.day,
          math.max(0L, st.pos + p.cnt - k),
          math.max(0L, st.neg + k - p.cnt))
        Iterator.single(DriftRow(key, p.day, p.cnt, st.pos, st.neg,
          st.pos > h || st.neg > h))
      }
    }.toVector
    state.update(st)
    out.iterator
  }

  /** Wire a (streaming or batch) frame of closed period counts
    * (event_type, day, cnt) into the stateful detector. Output mode for
    * streaming: Append (each closed period emits exactly one row, never
    * revised). `targets` is the per-key reference level from the
    * history profile; keys absent from it fold against 0. */
  def cusum(periods: DataFrame, targets: Map[String, Long],
      h: Long): Dataset[DriftRow] = {
    val spark = periods.sparkSession
    import spark.implicits._
    periods.as[PeriodCount]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        step(targets, h))
  }
}
