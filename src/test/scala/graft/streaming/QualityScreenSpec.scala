package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSparkSpec

/** Streaming KN quality screen e2e: a static model trained on a small
  * corpus, a MemoryStream of arriving docs scored per micro-batch via
  * foreachBatch — asserting the stream==batch law (each batch directory
  * equals the batch operator on those rows) and the known/novel split. */
class QualityScreenSpec extends GraftSparkSpec {

  test("stream scoring equals batch scoring, per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val train = Seq(
      (0L, "the cat sat on the mat"),
      (2L, "the cat ran to the mat"),
      (4L, "a dog sat on a rug"))
      .toDF("doc_id", "text")
    val model = QualityScreen.buildModel(train).materialize()

    val out = Files.createTempDirectory("graft-knscreen-").toString
    val ckpt = Files.createTempDirectory("graft-knscreen-ckpt-").toString
    val input = MemoryStream[(Long, String)]
    val q = QualityScreen.writer(input.toDF().toDF("doc_id", "text"),
      model, out, ckpt).start()
    try {
      // batch 0: one in-model doc, one half-novel, one fully novel
      val b0 = Seq(
        (100L, "the cat sat on the mat"),
        (101L, "the cat sat on pluto"),
        (102L, "entirely unseen wording here"))
      input.addData(b0: _*)
      q.processAllAvailable()
      val got0 = s.read.parquet(s"$out/batch=0")
        .orderBy("doc_id").collect()
      val want0 = QualityScreen.scoreBatch(
        b0.toDF("doc_id", "text"), model).orderBy("doc_id").collect()
      assert(got0.toSeq === want0.toSeq)
      // known/novel accounting: doc 100 all-known; doc 101 has exactly
      // two novel bigrams (on->pluto boundary + within); doc 102 scores NULL
      val m0 = got0.map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.isNullAt(4))).toMap
      assert(m0(100L) === ((5L, 5L, 0L, false)))
      assert(m0(101L) === ((4L, 3L, 1L, false)))
      assert(m0(102L) === ((3L, 0L, 3L, true)))

      // batch 1: a second micro-batch scores independently (no
      // cross-batch state) and still equals its batch evaluation
      val b1 = Seq((200L, "a dog sat on the mat"))
      input.addData(b1: _*)
      q.processAllAvailable()
      val got1 = s.read.parquet(s"$out/batch=1").collect()
      val want1 = QualityScreen.scoreBatch(
        b1.toDF("doc_id", "text"), model).collect()
      assert(got1.toSeq === want1.toSeq)
    } finally q.stop()
  }
}
