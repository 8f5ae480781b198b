package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.operators.Behavior

/** The report sink (S8 replacement) end-to-end over a MemoryStream. */
class ReportSinkSpec extends GraftSparkSpec {

  test("foreachBatch report writes all derived tables per tick, atomically re-runnable") {
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
      val vc = s.read.parquet(s"$out/batch=0/value_counts")
      assert(vc.count() === 6) // 2 events x 3 dims, all distinct values
      val cbs = s.read.parquet(s"$out/batch=0/clicks_by_service")
      assert(cbs.columns.toSeq === Seq("service", "clicks", "pct"))
      assert(cbs.agg(sum("pct")).head().getDouble(0) === 100.0)
      val bd = s.read.parquet(s"$out/batch=0/dim_breakdown")
      assert(bd.filter(col("dim") === "clicks").count() === 0)
      // idempotent re-run of a batch overwrites cleanly (S9 unnecessary)
      ReportSink.writeReport(Behavior.fanoutMessages(
        Seq((0L, 1L, "click", 7)).toDF("event_id", "user_id", "event_type", "k")
          .withColumn("props", format_string("""{"k": %d}""", col("k")))), out, 0L)
      assert(s.read.parquet(s"$out/batch=0/value_counts").count() === 3)
    } finally q.stop()
  }
}
