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

    // XOR retraction: re-folding doc 2's hash removes it from the
    // checksum — the manifest's content_fp returns to the fold WITHOUT
    // doc 2 (counts move by the compensating row's sums, documented:
    // a real takedown batch carries negated counts; here we check the
    // checksum leg, the one sums can't express)
    ContentManifest.applyBatch(
      Seq(doc("web", 2L, "gamma")).toDF("source", "doc_id", "text", "n_chars"),
      path, batchId = 2L)
    val fpAfter = ContentManifest.read(spark, path)
      .filter(org.apache.spark.sql.functions.col("source") === "web")
      .head().getLong(3)
    val fpWithout2 = batchRows(Seq(doc("web", 1L, "alpha beta"),
      doc("web", 4L, "epsilon"))).head.getLong(3)
    assert(fpAfter === fpWithout2)
  }
}
