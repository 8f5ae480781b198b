package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** flatMapGroupsWithState per-user profile: state accumulates across
  * micro-batches and survives within the query. */
class UserStateSpec extends GraftSparkSpec {

  test("per-user profile state accumulates across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val input = MemoryStream[UserEvent]
    // NoTimeout in the test: processing-time timeouts make the engine run
    // continuous timer micro-batches, so processAllAvailable never settles
    val q = UserState.profiles(input.toDF(), evictAfter = None)
      .writeStream.queryName("profiles_test")
      .outputMode("update").format("memory").start()
    try {
      input.addData(
        UserEvent(1L, "click", 1000L),
        UserEvent(1L, "view", 2000L),
        UserEvent(2L, "click", 1500L))
      q.processAllAvailable()
      input.addData(UserEvent(1L, "click", 5000L))
      q.processAllAvailable()

      // memory sink in update mode appends updated rows; latest per user wins
      val latest = s.sql("SELECT * FROM profiles_test")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("n_events").desc)))
        .filter(col("rn") === 1)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toMap

      assert(latest(1L) === ((3L, 2L, 1000L, 5000L))) // 3 events, 2 clicks, ts span
      assert(latest(2L) === ((1L, 1L, 1500L, 1500L)))
    } finally q.stop()
  }

  test("skew: 100k events on one hot user keep state at one row per user") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val input = MemoryStream[UserEvent]
    val q = UserState.profiles(input.toDF(), evictAfter = None)
      .writeStream.queryName("profiles_skew")
      .outputMode("update").format("memory").start()
    try {
      // one pathologically hot user (100k events over two micro-batches)
      // next to one cold user — the shape that melts a per-event state
      // design but must leave a per-KEY design at exactly two records
      val hot = 100000
      def batch(range: Range) =
        range.map(i => UserEvent(1L, if (i % 2 == 0) "click" else "view", i.toLong))
      input.addData(batch(0 until hot / 2): _*)
      input.addData(batch(hot / 2 until hot) :+ UserEvent(2L, "click", 7L): _*)
      q.processAllAvailable()

      // state rows == distinct users, independent of event volume
      val stateRows = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsTotal).max
      assert(stateRows === 2L,
        s"state grew beyond one row per user: $stateRows rows")

      // and the hot key's fold is still exact (iterator-based, no
      // per-group materialization to overflow)
      val p = s.sql("SELECT * FROM profiles_skew WHERE user_id = 1")
        .orderBy(col("n_events").desc).limit(1).collect()(0)
      assert(p.getLong(1) === hot.toLong)
      assert(p.getLong(2) === hot.toLong / 2) // every even i clicked
      assert((p.getLong(3), p.getLong(4)) === ((0L, hot.toLong - 1)))
    } finally q.stop()
  }
}
