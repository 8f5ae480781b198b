package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.operators.Profile

/** Stream-static anomaly screen: live rows vs historical per-key stats. */
class AnomalyScreenSpec extends GraftSparkSpec {

  // history: user 1 has spread (μ=300, σ_pop≈163.3); user 2 is
  // CONSTANT (zero variance → groupStats must exclude it entirely)
  private def history = {
    import spark.implicits._
    Seq((1L, 100L), (1L, 300L), (1L, 500L),
      (2L, 70L), (2L, 70L), (2L, 70L))
      .toDF("user_id", "c")
  }

  test("groupStats excludes degenerate (zero-variance) keys") {
    val stats = Profile.groupStats(history, "user_id", "c").collect()
    assert(stats.map(_.getLong(0)).toSeq === Seq(1L))
    val r = stats.head
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - 300.0) < 1e-9)
    // Σx = 900, Σx² = 350000: σ_pop = √(3·350000 − 900²)/3
    assert(math.abs(r.getDouble(3) - math.sqrt(3.0 * 350000 - 900.0 * 900) / 3) < 1e-9)
  }

  test("stream == batch: flagged rows identical, constant-key rows never flag") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val stats = Profile.groupStats(history, "user_id", "c")
    stats.cache().count()

    // live rows: (1, 310) within 2σ; (1, 9000) far out; (2, 9999) would
    // be "infinitely" anomalous but its key is degenerate → must not flag
    val live = Seq((1L, 310L, "a"), (1L, 9000L, "b"), (2L, 9999L, "c"))
    val batchOut = AnomalyScreen
      .flag(live.toDF("user_id", "c", "tag"), stats, "user_id", "c", 2.0)
      .select(col("user_id"), col("tag"), col("z")).collect()
    assert(batchOut.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "b")))
    assert(batchOut.head.getDouble(2) > 2.0)

    val input = MemoryStream[(Long, Long, String)]
    val q = AnomalyScreen
      .flag(input.toDF().toDF("user_id", "c", "tag"), stats, "user_id", "c", 2.0)
      .select(col("user_id"), col("tag"), col("z"))
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    try {
      input.addData(live: _*)
      q.processAllAvailable()
      val streamOut = s.table("anomaly_out").collect()
      assert(streamOut.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ===
        batchOut.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)
    } finally q.stop()
  }
}
