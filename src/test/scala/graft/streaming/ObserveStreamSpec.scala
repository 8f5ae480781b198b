package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Streaming half of the Observation story (batch half:
  * `DataQuality.observedMetrics` + `rel_observe_metrics`): a named
  * `observe` node on a streaming frame reports its aggregates PER
  * MICRO-BATCH through `StreamingQueryProgress.observedMetrics` — the
  * zero-extra-pass ingest monitor (rows seen, violation counts) a
  * production stream attaches to the transform it already runs. */
class ObserveStreamSpec extends GraftSparkSpec {

  test("named observe reports per-micro-batch metrics in query progress") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val input = MemoryStream[(Long, Long)]
    val observed = input.toDF().toDF("k", "v")
      .observe("ingest_dq",
        count(lit(1)).as("n_rows"),
        sum(when(col("v") < 0, 1L).otherwise(0L)).as("n_neg"),
        max(col("v")).as("max_v"))
      .filter(col("v") >= 0) // metrics observe PRE-filter rows
    val q = observed.writeStream.queryName("observe_stream")
      .outputMode("append").format("memory").start()
    // last DATA batch's metrics (a trailing empty micro-batch may post a
    // progress too — its zero row count must not shadow the real batch)
    def lastMetrics() = q.recentProgress
      .filter(p => p.observedMetrics.containsKey("ingest_dq") && p.numInputRows > 0)
      .last.observedMetrics.get("ingest_dq")
    try {
      input.addData((1L, 10L), (2L, -5L), (3L, 7L))
      q.processAllAvailable()
      val m1 = lastMetrics()
      assert(m1.getAs[Long]("n_rows") === 3L)
      assert(m1.getAs[Long]("n_neg") === 1L) // the violation was SEEN...
      assert(m1.getAs[Long]("max_v") === 10L)
      // ...even though the filter dropped it from the sink
      assert(s.sql("SELECT COUNT(*) FROM observe_stream").head().getLong(0) === 2L)

      // metrics are per-batch, not cumulative
      input.addData((4L, 20L))
      q.processAllAvailable()
      val m2 = lastMetrics()
      assert(m2.getAs[Long]("n_rows") === 1L)
      assert(m2.getAs[Long]("n_neg") === 0L)
      assert(m2.getAs[Long]("max_v") === 20L)
    } finally q.stop()
  }
}
