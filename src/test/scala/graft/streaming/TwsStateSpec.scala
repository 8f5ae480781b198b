package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSparkSpec

object TwsStateSpec {
  val collected = TrieMap.empty[String, ArrayBuffer[UserProfile]]
}

/** transformWithState (Spark 4 successor to flatMapGroupsWithState) must
  * obey the SAME output law as the V1 operator: identical per-user
  * profiles over identical input, state accumulating across micro-batches.
  * Runs under RocksDB — transformWithState's runtime contract. */
class TwsStateSpec extends GraftSparkSpec {
  import TwsStateSpec.collected

  private def withRocksDb[A](body: => A): A = {
    val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  test("transformWithState profiles == flatMapGroupsWithState profiles") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val batch1 = Seq(
      UserEvent(1L, "click", 1000L), UserEvent(1L, "view", 2000L),
      UserEvent(2L, "click", 1500L), UserEvent(3L, "view", 900L))
    val batch2 = Seq(
      UserEvent(1L, "click", 5000L), UserEvent(3L, "click", 4000L))

    def run(tag: String, wire: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[UserProfile]): Map[Long, UserProfile] = {
      collected.put(tag, ArrayBuffer.empty)
      val input = MemoryStream[UserEvent]
      val q = wire(input.toDF()).writeStream.queryName(s"tws_$tag")
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[UserProfile], _: Long) =>
          collected(tag).synchronized { collected(tag) ++= b.collect() }
          ()
        }
        .start()
      try {
        input.addData(batch1: _*)
        q.processAllAvailable()
        input.addData(batch2: _*)
        q.processAllAvailable()
      } finally q.stop()
      // latest emitted profile per user (update mode re-emits on change)
      collected(tag).groupBy(_.user_id)
        .map { case (u, ps) => u -> ps.maxBy(_.n_events) }
    }

    val (v2, v1) = withRocksDb {
      (run("v2", df => UserStateV2.profiles(df, ttl = None)),
        run("v1", df => UserState.profiles(df, evictAfter = None)))
    }
    assert(v2 === v1)
    assert(v2(1L) === UserProfile(1L, 3L, 2L, 1000L, 5000L))
    assert(v2(3L) === UserProfile(3L, 2L, 1L, 900L, 4000L))
  }

  test("transformWithState with a TTL set starts and folds correctly") {
    // ttl=Some(...) switches the query to TimeMode.ProcessingTime —
    // Spark rejects a non-zero TTL in TimeMode.None
    // (StatefulProcessorCannotAssignTTLInTimeMode). An hour-long TTL
    // cannot expire within the test, so the fold law must still hold.
    // ProcessingTime mode keeps scheduling no-data micro-batches for
    // timer/TTL upkeep, so neither processAllAvailable nor AvailableNow
    // ever reaches quiescence — poll the foreachBatch collector for the
    // folded profile instead and stop the query once it arrives.
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val out = withRocksDb {
      collected.put("ttl", ArrayBuffer.empty)
      val input = MemoryStream[UserEvent]
      input.addData(
        UserEvent(7L, "click", 100L), UserEvent(7L, "view", 200L),
        UserEvent(7L, "click", 900L))
      val q = UserStateV2
        .profiles(input.toDF(), ttl = Some(java.time.Duration.ofHours(1)))
        .writeStream.queryName("tws_ttl").outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[UserProfile], _: Long) =>
          collected("ttl").synchronized { collected("ttl") ++= b.collect() }
          ()
        }
        .start()
      try {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        def folded() = collected("ttl").synchronized {
          collected("ttl").exists(_.n_events == 3L)
        }
        while (!folded() && System.nanoTime() < deadline) {
          if (q.exception.isDefined) throw q.exception.get
          Thread.sleep(200)
        }
        assert(folded(), "TTL'd query never emitted the folded profile")
      } finally q.stop()
      collected("ttl").synchronized { collected("ttl").maxBy(_.n_events) }
    }
    assert(out === UserProfile(7L, 3L, 2L, 100L, 900L))
  }
}
