package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSparkSpec

/** Online dataset-manifest e2e: MemoryStream of documents upserted into
  * the per-source manifest — asserting the stream==batch prefix law
  * after every micro-batch (sums AND the XOR checksum), redelivery
  * idempotence, and XOR's self-inverse retraction property. */
class ContentManifestSpec extends GraftSparkSpec {

  private type Doc = (String, Long, String, Long)
  private def doc(src: String, id: Long, text: String): Doc =
    (src, id, text, text.length.toLong)

  private def manifestRows(path: String) =
    ContentManifest.read(spark, path)
      .orderBy("source").collect().toSeq

  private def batchRows(prefix: Seq[Doc]) = {
    val s = spark; import s.implicits._
    ContentManifest.manifestOf(
        prefix.toDF("source", "doc_id", "text", "n_chars"))
      .select("source", "n_docs", "total_chars", "content_fp")
      .orderBy("source").collect().toSeq
  }

  test("maintained manifest equals the batch fingerprint after every micro-batch") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val path = Files.createTempDirectory("graft-manifest-").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-manifest-ckpt-").toString
    val input = MemoryStream[Doc]
    val q = ContentManifest.maintainManifest(
        input.toDF().toDF("source", "doc_id", "text", "n_chars"), path)
      .option("checkpointLocation", ckpt).start()
    try {
      val b0 = Seq(doc("web", 1L, "alpha beta"), doc("web", 2L, "gamma"),
        doc("book", 3L, "delta"))
      input.addData(b0: _*)
      q.processAllAvailable()
      assert(manifestRows(path) === batchRows(b0))

      // batch 1 touches only 'web'; 'book' history merges untouched and
      // the XOR checksum still equals the full-prefix fold
      val b1 = Seq(doc("web", 4L, "epsilon"))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(manifestRows(path) === batchRows(b0 ++ b1))
    } finally q.stop()

    // redelivery no-op through the marker commit
    val before = manifestRows(path)
    ContentManifest.applyBatch(
      Seq(doc("web", 4L, "epsilon")).toDF("source", "doc_id", "text", "n_chars"),
      path, batchId = 1L)
    assert(manifestRows(path) === before)

    // FULL takedown via the signed retraction entry point: doc 2's
    // counts decrement AND its re-folded hash cancels out of the
    // checksum — the whole manifest row (n_docs, total_chars,
    // content_fp) returns to the never-ingested-doc-2 fingerprint. The
    // retraction stream numbers its own batches from 0; its markers
    // live in a separate namespace, so batchId 0 here cannot collide
    // with the ingest stream's batch 0.
    ContentManifest.applyRetraction(
      Seq(doc("web", 2L, "gamma")).toDF("source", "doc_id", "text", "n_chars"),
      path, batchId = 0L)
    val without2 = Seq(doc("web", 1L, "alpha beta"), doc("web", 4L, "epsilon"),
      doc("book", 3L, "delta"))
    assert(manifestRows(path) === batchRows(without2))
    // retraction redelivery is a no-op through its own marker
    ContentManifest.applyRetraction(
      Seq(doc("web", 2L, "gamma")).toDF("source", "doc_id", "text", "n_chars"),
      path, batchId = 0L)
    assert(manifestRows(path) === batchRows(without2))
  }
}
