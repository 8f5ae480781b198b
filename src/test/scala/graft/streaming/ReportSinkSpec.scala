package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.operators.Behavior

/** The report sink (S8 replacement) end-to-end over a MemoryStream:
  * per-tick tables must be CUMULATIVE (reference T2 semantics), not
  * batch-local. */
class ReportSinkSpec extends GraftSparkSpec {

  test("report tables are cumulative across ticks and idempotently re-writable") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val out = Files.createTempDirectory("graft-report-").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString

    val input = MemoryStream[(Long, Long, String, Int)]
    val events = input.toDF().toDF("event_id", "user_id", "event_type", "k")
      .withColumn("props", format_string("""{"k": %d}""", col("k")))
    val q = ReportSink.writer(Behavior.fanoutMessages(events), out, ckpt,
      cadence = "0 seconds").start()
    try {
      input.addData((0L, 1L, "click", 7), (1L, 2L, "view", 9))
      q.processAllAvailable()
      val vc0 = s.read.parquet(s"$out/batch=0/value_counts")
      assert(vc0.count() === 6) // 2 events x 3 dims, all distinct values
      val cbs0 = s.read.parquet(s"$out/batch=0/clicks_by_service")
      assert(cbs0.columns.toSeq === Seq("service", "clicks", "pct", "label"))
      assert(cbs0.agg(sum("pct")).head().getDouble(0) === 100.0)
      // F5: the reference's pie-slice label `f'{service} ({count})'`
      assert(cbs0.filter(col("service") === "click")
        .head().getAs[String]("label") === "click (1)")

      // tick 2: the NEW batch dir must reflect FULL history (T2), so the
      // click_clicks count is 2 (one from each tick)
      input.addData((2L, 3L, "click", 7))
      q.processAllAvailable()
      val vc1 = s.read.parquet(s"$out/batch=1/value_counts")
      val clickCnt = vc1.filter(col("topic") === "click_clicks").head().getLong(2)
      assert(clickCnt === 2)
      val bd1 = s.read.parquet(s"$out/batch=1/dim_breakdown")
      assert(bd1.filter(col("dim") === "clicks").count() === 0)
      assert(bd1.filter(col("dim") === "k" && col("value") === "7")
        .head().getLong(3) === 2) // cumulative k=7 across both click events
    } finally q.stop()

    // idempotent re-write of a batch snapshot (S9 unnecessary)
    val snap = Seq(("click_clicks", "1", 5L)).toDF("topic", "value", "cnt")
    ReportSink.writeReport(snap, out, 0L)
    assert(spark.read.parquet(s"$out/batch=0/value_counts").count() === 1)
  }
}
