package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSparkSpec

/** Streaming CUSUM drift detector: the all-integer recursion must agree
  * bit-for-bit with the batch fold on any prefix, carry state across
  * micro-batches, and drop late period closes honestly. */
class DriftScreenSpec extends GraftSparkSpec {

  // type A, k=2: counts 3,1,2,6,5 → S⁺ = 1,0,0,4,7; S⁻ = 0,1,1,0,0;
  // h=5 → drift fires on the LAST day only (S⁺=7)
  private val days = Seq(
    PeriodCount("A", 0L, 3L), PeriodCount("A", 1L, 1L),
    PeriodCount("A", 2L, 2L), PeriodCount("A", 3L, 6L),
    PeriodCount("A", 4L, 5L))
  private val targets = Map("A" -> 2L)

  test("batch fold: hand-computed S⁺/S⁻ sequence, threshold flag") {
    val s = spark
    import s.implicits._
    val out = DriftScreen.cusum(days.toDF(), targets, h = 5L)
      .collect().sortBy(_.day)
    assert(out.map(r => (r.cusum_pos, r.cusum_neg, r.drift)).toSeq === Seq(
      (1L, 0L, false), (0L, 1L, false), (0L, 1L, false),
      (4L, 0L, false), (7L, 0L, true)))
  }

  test("stream == batch across micro-batches; late close dropped") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val batchOut = DriftScreen.cusum(days.toDF(), targets, h = 5L)
      .collect().sortBy(_.day).toSeq

    val input = MemoryStream[PeriodCount]
    val q = DriftScreen.cusum(input.toDF(), targets, h = 5L)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      input.addData(days.take(2): _*) // batch 1: days 0,1
      q.processAllAvailable()
      // batch 2: days 2,3,4 plus a LATE re-close of day 1 (must drop,
      // not refold — state already advanced past it)
      input.addData(days.drop(2) :+ PeriodCount("A", 1L, 100L): _*)
      q.processAllAvailable()
      val streamOut = s.table("drift_out").as[DriftRow]
        .collect().sortBy(_.day).toSeq
      assert(streamOut === batchOut)
    } finally q.stop()
  }

  test("end-to-end: watermark-closed daily windows feed the detector") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx = s.sqlContext
    // stage 1 — the production upstream: event-time window("1 day") agg
    // in Append mode, so a day's count row EMITS only when the watermark
    // passes its close (the in-order-closes guarantee DriftScreen's
    // late-drop rule assumes)
    val events = MemoryStream[(String, java.sql.Timestamp)]
    val dayMs = 86400000L
    val closed = events.toDF().toDF("event_type", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"),
        (unix_millis(col("window.start")) / dayMs).as("day"), col("cnt"))
    val q1 = closed.writeStream.format("memory").queryName("closed_days")
      .outputMode("append").start()
    try {
      def at(day: Long, n: Int, t: String) =
        (0 until n).map(_ => (t, new java.sql.Timestamp(day * dayMs + 1000)))
      events.addData(at(0, 3, "A") ++ at(1, 1, "A"): _*)
      q1.processAllAvailable() // watermark at day 1 → day 0 closes
      events.addData(at(2, 2, "A"): _*) // day 1 closes
      q1.processAllAvailable()
      events.addData(at(3, 1, "A"): _*) // day 2 closes
      q1.processAllAvailable()
      val closedRows = s.table("closed_days")
        .as[(String, Double, Long)].collect()
        .map(r => PeriodCount(r._1, r._2.toLong, r._3)).sortBy(_.day)
      // days 0,1,2 closed with counts 3,1,2 (day 3 still open)
      assert(closedRows.map(r => (r.day, r.cnt)).toSeq ===
        Seq((0L, 3L), (1L, 1L), (2L, 2L)))
      // stage 2 — relay the closed rows into the detector and match the
      // batch fold on the same counts
      val batchOut = DriftScreen.cusum(closedRows.toSeq.toDF(), targets, 5L)
        .collect().sortBy(_.day).toSeq
      val relay = MemoryStream[PeriodCount]
      val q2 = DriftScreen.cusum(relay.toDF(), targets, 5L)
        .writeStream.format("memory").queryName("drift_e2e")
        .outputMode("append").start()
      try {
        closedRows.foreach { r => relay.addData(r); q2.processAllAvailable() }
        assert(s.table("drift_e2e").as[DriftRow].collect().sortBy(_.day).toSeq
          === batchOut)
      } finally q2.stop()
    } finally q1.stop()
  }

  test("unknown key folds against target 0; keys are independent") {
    val s = spark
    import s.implicits._
    val out = DriftScreen.cusum(
      Seq(PeriodCount("B", 0L, 4L), PeriodCount("A", 0L, 3L)).toDF(),
      targets, h = 5L).collect()
    val byKey = out.map(r => r.event_type -> ((r.cusum_pos, r.cusum_neg))).toMap
    assert(byKey("B") === ((4L, 0L))) // k=0: pure cumulative sum
    assert(byKey("A") === ((1L, 0L)))
  }
}
