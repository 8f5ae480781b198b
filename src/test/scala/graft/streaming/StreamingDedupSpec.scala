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

  test("band index persists as a bucketed table and reloads intact") {
    val s = spark
    import s.implicits._
    val historical = Seq(
      (0L, base.mkString(" ")),
      (2L, Seq("one", "two", "three", "four", "five", "six").mkString(" ")))
      .toDF("doc_id", "text")
    val (bands, shingles) = StreamingDedup.buildIndex(historical)
    val path = Files.createTempDirectory("graft-bandidx-").toString + "/t"
    val reloaded = StreamingDedup.persistAndReload(
      bands, "graft_band_index_spec", path, nBuckets = 4)
    try {
      // table carries the bucket spec (the no-shuffle-on-history layout)
      val ddl = s.sql("DESCRIBE TABLE EXTENDED graft_band_index_spec")
        .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString(";")
      assert(ddl.contains("Num Buckets=4"), ddl)
      assert(ddl.contains("band") && ddl.contains("bsig"))
      // roundtrip is lossless: same rows as the in-memory band table
      assert(reloaded.collect().map(_.toSeq).toSet
        === bands.collect().map(_.toSeq).toSet)
      // dedup against the RELOADED index == against the in-memory one
      val batch = Seq((100L, (base.init :+ "CHANGED").mkString(" ")))
        .toDF("doc_id", "text")
      val viaDisk = StreamingDedup.dedupBatch(batch, reloaded, shingles, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val viaMem = StreamingDedup.dedupBatch(batch, bands, shingles, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(viaDisk === viaMem)
      assert(viaDisk.map(p => (p._1, p._2)) === Seq((100L, 0L)))
    } finally s.sql("DROP TABLE IF EXISTS graft_band_index_spec")
  }

  test("ingest contamination screen: stream batches score against the " +
    "static benchmark gram index (stream == batch)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val bench = Seq((900L, "a b c d"), (901L, "p q r s t")).toDF("doc_id", "text")
    val benchGrams = graft.operators.TextOps.gramIndex(bench, 3)
    benchGrams.cache().count()

    val out = Files.createTempDirectory("graft-contam-").toString
    val ckpt = Files.createTempDirectory("graft-contam-ckpt-").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.contaminationWriter(
      input.toDF().toDF("doc_id", "text"), benchGrams, 3, 0.4, out, ckpt).start()
    try {
      val batch0 = Seq(
        (1L, "a b c x"), // shares 'a b c' -> 1/2 grams, flagged at 0.4
        (2L, "q r s zz ww"), // shares 'q r s' -> 1/3 grams, not flagged
        (3L, "clean text only here")) // no overlap -> absent
      input.addData(batch0: _*)
      q.processAllAvailable()
      val got = s.read.parquet(s"$out/batch=0").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(5))).sorted.toSeq
      assert(got === Seq((1L, 2L, 1L, 1), (2L, 3L, 1L, 0)))
      // stream == batch law: the indexed batch operator agrees exactly
      val batchGot = graft.operators.TextOps.contaminationReportIndexed(
        batch0.toDF("doc_id", "text"), benchGrams, 3, 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(5)))
        .sorted.toSeq
      assert(batchGot === got)
    } finally {
      q.stop()
      benchGrams.unpersist()
    }
  }

  test("embedding stream flags semantic dups via the static LSH bucket " +
    "index, as a pure stream-static join (stream == batch)") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext

    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val h0 = vec()
    val historical = Seq((0L, h0), (1L, vec())).toDF("vec_id", "embedding")
    val index = StreamingDedup.buildVectorIndex(historical, dim = 16)
    index.cache().count()

    val input = MemoryStream[(Long, Array[Float])]
    val flagged = StreamingDedup.dedupVectorStream(
      input.toDF().toDF("vec_id", "embedding"), index, 0.9, dim = 16)
    assert(flagged.isStreaming) // a transform, not a foreachBatch escape
    val q = flagged.writeStream.queryName("vec_dedup")
      .outputMode("append").format("memory").start()
    try {
      // one semantic dup of historical vector 0 + one novel vector
      val batch = Seq((100L, h0.clone()), (101L, vec()))
      input.addData(batch: _*)
      q.processAllAvailable()
      val got = s.sql("SELECT * FROM vec_dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got.map(g => (g._1, g._2)) === Seq((100L, 0L)))
      assert(got.head._3 > 0.99)
      // stream == batch law: the same transform on a batch frame agrees
      val batchGot = StreamingDedup.dedupVectorStream(
        batch.toDF("vec_id", "embedding"), index, 0.9, dim = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(batchGot === got)
    } finally {
      q.stop()
      index.unpersist()
    }
  }

  test("Bloom screen stream: probe flags seen chunks, stream == batch") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    def words(tag: String, n: Int): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val historical = Seq((0L, words("h", 64)), (2L, words("k", 40)))
      .toDF("doc_id", "text")
    val bitset = graft.operators.Dedup.bloomBitset(historical)
    assert(bitset.length === 1024)

    val out = Files.createTempDirectory("graft-bloom-").toString
    val ckpt = Files.createTempDirectory("graft-bloom-ckpt-").toString
    val input = MemoryStream[(Long, String)]
    val batch0 = Seq(
      (1L, words("h", 64)), // both chunks in history
      (3L, words("h", 32) + " " + words("z", 10)), // first chunk shared
      (5L, words("q", 50))) // disjoint
    val q = StreamingDedup.bloomWriter(input.toDF().toDF("doc_id", "text"),
      bitset, 32, out, ckpt).start()
    try {
      input.addData(batch0: _*)
      q.processAllAvailable()
      val got = s.read.parquet(s"$out/batch=0").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got(1L) === ((2L, 2L)))
      assert(got(3L) === ((2L, 1L)))
      assert(got(5L)._2 === 0L) // disjoint: no false positive at this fill
      // stream == batch law: the same transform on a batch frame agrees
      val batchGot = graft.operators.Dedup
        .bloomProbe(batch0.toDF("doc_id", "text"), bitset).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(batchGot === got)
    } finally q.stop()
  }
}
