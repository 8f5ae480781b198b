package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.GraftSparkSpec

/** Streaming DSIR screen e2e: a static contrast model trained on a small
  * target/raw corpus, a MemoryStream of arriving docs scored per
  * micro-batch via foreachBatch — asserting the stream==batch law and
  * that target-vocabulary arrivals outscore noise-vocabulary ones. */
class DsirScreenSpec extends GraftSparkSpec {

  test("stream scoring equals batch scoring, per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    // target speaks {alpha, beta}; the raw remainder adds {zork, quux}
    val corpus = Seq(
      (0L, "alpha beta alpha", true), (1L, "beta alpha beta", true),
      (2L, "alpha beta", false), (3L, "zork quux zork", false))
      .toDF("doc_id", "text", "is_t")
    val model = DsirScreen.buildModel(corpus, col("is_t"), 64).materialize()

    val out = Files.createTempDirectory("graft-dsirscreen-").toString
    val ckpt = Files.createTempDirectory("graft-dsirscreen-ckpt-").toString
    val input = MemoryStream[(Long, String)]
    val q = DsirScreen.writer(input.toDF().toDF("doc_id", "text"),
      model, out, ckpt).start()
    try {
      // batch 0: one target-vocab arrival, one noise-vocab arrival
      val b0 = Seq((100L, "alpha beta"), (101L, "zork quux"))
      input.addData(b0: _*)
      q.processAllAvailable()
      val got0 = s.read.parquet(s"$out/batch=0").orderBy("doc_id").collect()
      val want0 = DsirScreen.scoreBatch(b0.toDF("doc_id", "text"), model)
        .orderBy("doc_id").collect()
      assert(got0.toSeq === want0.toSeq)
      val m0 = got0.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(m0(100L)._1 === 3L) // 2 unigrams + 1 bigram
      assert(m0(100L)._2 > m0(101L)._2) // target vocab outscores noise

      // batch 1: scores independently (no cross-batch state) and still
      // equals its batch evaluation
      val b1 = Seq((200L, "beta beta beta"))
      input.addData(b1: _*)
      q.processAllAvailable()
      val got1 = s.read.parquet(s"$out/batch=1").collect()
      val want1 = DsirScreen.scoreBatch(b1.toDF("doc_id", "text"), model)
        .collect()
      assert(got1.toSeq === want1.toSeq)
    } finally q.stop()
  }

  test("the frozen dim matches the batch screen's own contrast") {
    val s = spark
    import s.implicits._
    // on the full corpus, scoring with the frozen dim reproduces the
    // batch dsirScreen rows (screen = score + deterministic top-k)
    val corpus = Seq(
      (0L, "alpha beta alpha", true), (1L, "beta alpha beta", true),
      (2L, "alpha beta", false), (3L, "zork quux zork", false))
      .toDF("doc_id", "text", "is_t")
    val model = DsirScreen.buildModel(corpus, col("is_t"), 64)
    val scored = DsirScreen.scoreBatch(corpus.select("doc_id", "text"), model)
      .orderBy(col("dsir_score").desc, col("doc_id")).collect()
    val screened = graft.operators.TextOps
      .dsirScreen(corpus, col("is_t"), 64, 10).collect()
    assert(scored.toSeq === screened.toSeq)
  }
}
