package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Online distinct-count maintenance e2e: MemoryStream of events upserted
  * as per-(day, event_type) HLL sketches — asserting the stream==batch
  * prefix law (maintained estimates equal one-shot sketching of the whole
  * prefix, and at these cardinalities the sketch is EXACT, so estimates
  * equal true distinct counts), the cross-key roll-up, and redelivery
  * idempotence (union is idempotent only via the marker protocol — a
  * re-union of the same sketch is harmless, but a re-applied DELTA batch
  * would double n_events; the marker stops it before either). */
class CardinalityScreenSpec extends GraftSparkSpec {

  private type Ev = (String, String, Long)

  private def estRows(path: String) =
    CardinalityScreen.estimates(spark, path)
      .orderBy("day", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private def batchRows(prefix: Seq[Ev]) = {
    val s = spark; import s.implicits._
    CardinalityScreen.sketchOf(prefix.toDF("day", "event_type", "user_id"))
      .select(col("day"), col("event_type"), col("n_events"),
        hll_sketch_estimate(col("users_sk")).as("est_users"))
      .orderBy("day", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("maintained sketch table equals one-shot sketching of the stream prefix") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val path = Files.createTempDirectory("graft-card-").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-card-ckpt-").toString
    val input = MemoryStream[Ev]
    val q = CardinalityScreen.maintainDistincts(
        input.toDF().toDF("day", "event_type", "user_id"), path)
      .option("checkpointLocation", ckpt).start()
    try {
      val b0 = Seq(("d1", "click", 1L), ("d1", "click", 2L), ("d1", "click", 1L),
        ("d1", "view", 3L), ("d2", "click", 1L))
      input.addData(b0: _*)
      q.processAllAvailable()
      assert(estRows(path) === batchRows(b0))

      // batch 1: user 2 repeats on d1/click (distinct stays 2, n_events
      // grows), a new user lands on d2 — prefix law holds after the merge
      val b1 = Seq(("d1", "click", 2L), ("d2", "click", 9L))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(estRows(path) === batchRows(b0 ++ b1))
      // at this cardinality HLL is exact: check true distincts directly
      val m = estRows(path).map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(m(("d1", "click")) === ((4L, 2L)))
      assert(m(("d2", "click")) === ((2L, 2L)))

      // roll-up across event types without raw history: d1 users {1,2,3}
      val roll = CardinalityScreen.dailyRollup(s, path)
        .orderBy("day").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(roll("d1") === ((5L, 3L)))
      assert(roll("d2") === ((2L, 2L)))
    } finally q.stop()

    // redelivery no-op through the marker commit
    val before = estRows(path)
    CardinalityScreen.applyBatch(
      Seq(("d1", "click", 2L), ("d2", "click", 9L)).toDF("day", "event_type", "user_id"),
      path, batchId = 1L)
    assert(estRows(path) === before)
  }
}
