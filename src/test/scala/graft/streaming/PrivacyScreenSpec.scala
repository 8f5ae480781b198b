package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.operators.DataQuality

/** Online k-anonymity maintenance e2e: a MemoryStream of QI-bearing rows
  * upserted into the on-disk class-count table — asserting the
  * stream==batch law (the audited table equals `DataQuality.kAnonymity`
  * over the stream prefix after EVERY micro-batch) and redelivery
  * idempotence through the PartitionedUpsert marker protocol. */
class PrivacyScreenSpec extends GraftSparkSpec {

  private def auditRows(path: String, k: Int) =
    PrivacyScreen.audit(spark, path, k)
      .select(col("nation").cast("string"), col("segment"),
        col("class_size"), col("violates_k"), col("reident_ppm"))
      .orderBy("nation", "segment").collect().toSeq

  private def batchRows(prefix: Seq[(String, String)], k: Int) = {
    val s = spark; import s.implicits._
    DataQuality.kAnonymity(prefix.toDF("nation", "segment"),
        Seq(col("nation"), col("segment")), k)
      .select(col("nation"), col("segment"), col("class_size"),
        col("violates_k"), col("reident_ppm"))
      .orderBy("nation", "segment").collect().toSeq
  }

  test("maintained class table equals the batch gate after every micro-batch") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val path = Files.createTempDirectory("graft-privacy-").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-privacy-ckpt-").toString
    val input = MemoryStream[(String, String)]
    val q = PrivacyScreen.maintainClassSizes(
        input.toDF().toDF("nation", "segment"), path, "nation", "segment")
      .option("checkpointLocation", ckpt).start()
    try {
      val b0 = Seq(("de", "auto"), ("de", "auto"), ("de", "home"), ("fr", "auto"))
      input.addData(b0: _*)
      q.processAllAvailable()
      assert(auditRows(path, 2) === batchRows(b0, 2))

      // batch 1 lands only in the 'de' partition; 'fr' history is merged
      // untouched and the prefix law still holds (sizes ACCUMULATE)
      val b1 = Seq(("de", "auto"), ("de", "home"))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(auditRows(path, 2) === batchRows(b0 ++ b1, 2))
      // de/auto crossed k=2 → flag clears; fr/auto singleton still fires
      val m = auditRows(path, 2).map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getInt(3))).toMap
      assert(m(("de", "auto")) === ((3L, 0)))
      assert(m(("fr", "auto")) === ((1L, 1)))
    } finally q.stop()

    // redelivery no-op: re-applying an already-committed batch id must
    // not double count (the marker commit makes add-merge idempotent)
    val before = auditRows(path, 2)
    PrivacyScreen.applyBatch(Seq(("de", "auto")).toDF("nation", "segment"),
      path, "nation", "segment", batchId = 1L)
    assert(auditRows(path, 2) === before)
  }
}
