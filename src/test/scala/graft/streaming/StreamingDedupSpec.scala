package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Incremental dedup of a doc stream against a static historical index. */
class StreamingDedupSpec extends GraftSparkSpec {

  private val base = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")

  test("stream batches are flagged against the historical minhash index") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val historical = Seq(
      (0L, base.mkString(" ")),
      (1L, base.reverse.mkString(" ")),
      (2L, Seq("one", "two", "three", "four", "five", "six").mkString(" ")))
      .toDF("doc_id", "text")
    val (bands, shingles) = StreamingDedup.buildIndex(historical)
    bands.cache().count(); shingles.cache().count()

    val out = Files.createTempDirectory("graft-sdedup-").toString
    val ckpt = Files.createTempDirectory("graft-sdedup-ckpt-").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.writer(input.toDF().toDF("doc_id", "text"),
      bands, shingles, 0.5, out, ckpt).start()
    try {
      // batch 0: one near-dup of doc 0 (one token changed) + one novel doc
      input.addData(
        (100L, (base.init :+ "CHANGED").mkString(" ")),
        (101L, Seq("totally", "new", "content", "nothing", "shared", "xx").mkString(" ")))
      q.processAllAvailable()
      val flagged = s.read.parquet(s"$out/batch=0").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(flagged.length === 1)
      assert(flagged(0)._1 === 100L && flagged(0)._2 === 0L)
      assert(flagged(0)._3 > 0.5 && flagged(0)._3 < 1.0)

      // batch 1: exact dup of historical doc 2
      input.addData((200L, Seq("one", "two", "three", "four", "five", "six").mkString(" ")))
      q.processAllAvailable()
      val f2 = s.read.parquet(s"$out/batch=1").collect()
      assert(f2.length === 1)
      assert(f2(0).getLong(0) === 200L && f2(0).getLong(1) === 2L)
      assert(f2(0).getDouble(2) === 1.0)
    } finally q.stop()
  }
}
