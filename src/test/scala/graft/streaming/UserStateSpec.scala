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
}
