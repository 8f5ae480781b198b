package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSparkSpec

/** END-TO-END crash recovery for [[PartitionedUpsert]]: a real file
  * stream is killed INSIDE the committed-but-unpublished window (after
  * the marker rename, before publish), then RESTARTED from its
  * checkpoint — Structured Streaming redelivers the same micro-batch,
  * `recoverPending` finishes the interrupted publish, the marker makes
  * the redelivered merge a no-op, and the maintained table comes out
  * equal to the batch aggregate: exactly-once across the crash point,
  * proven for all three merge classes (SUM, XOR, HLL union) in one
  * table. The unit-level staging/marker checks live in StreamingSpec;
  * this drives the same window through the actual restart machinery. */
class UpsertCrashSpec extends GraftSparkSpec {

  test("restart after a crash between COMMIT and publish is exactly-once for sum+xor+hll") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-upsert-crash-").toString
    val path = s"$root/state"
    val upsert = new PartitionedUpsert(
      path, partCol = "day", keyCols = Seq("k"),
      sumCols = Seq("n"),
      aggregate = _.groupBy(col("day"), col("k"))
        .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("fp"),
          hll_sketch_agg(col("u")).as("sk")),
      xorCols = Seq("fp"),
      sketchCols = Seq("sk"))

    // 30 rows over 2 days × 3 keys, content-addressed hash + user id
    val rows = (0 until 30).map { i =>
      (s"2024-01-0${i % 2 + 1}", s"k${i % 3}", (i * 0x9E3779B9L) ^ 0x5A5AL,
        (i % 7).toLong)
    }
    val src = s"$root/src"
    rows.toDF("day", "k", "h", "u").repartition(3).write.parquet(src)
    val stream = s.readStream.schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)

    // batch 1's first delivery: stage + COMMIT, then die before publish
    @volatile var crashes = 0
    def writer = stream.writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (id == 1 && crashes == 0) {
          crashes += 1
          upsert.recoverPending(b.sparkSession)
          upsert.stageAndCommit(b, id)
          sys.error("simulated crash between COMMIT and publish")
        } else upsert.applyBatch(b, id)
      }
      .option("checkpointLocation", s"$root/cp")
      .trigger(Trigger.AvailableNow())

    val q1 = writer.start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(crashes === 1)
    // the crash window is real: committed (marker present) but
    // unpublished (staging still on disk)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      s.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_applied/batch-1")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_staging/batch-1")))

    val q2 = writer.start()
    q2.awaitTermination()
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_staging")) === false ||
      fs.listStatus(new org.apache.hadoop.fs.Path(path, "_staging")).isEmpty)

    // maintained table == direct batch aggregate, all three merge classes:
    // a lost batch 1 would break sums, a double-applied batch 1 would
    // break sums AND cancel fp hashes; hll registers compare via estimate
    val got = s.read.parquet(path)
      .select(col("day").cast("string").as("day"), col("k"), col("n"),
        col("fp"), hll_sketch_estimate(col("sk")).as("users"))
      .orderBy(col("day"), col("k")).collect().toSeq
    val want = rows.toDF("day", "k", "h", "u")
      .groupBy(col("day"), col("k"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("fp"),
        hll_sketch_estimate(hll_sketch_agg(col("u"))).as("users"))
      .orderBy(col("day"), col("k")).collect().toSeq
    assert(got === want)
  }

  test("another stream's committed-unpublished batch publishes before this stream merges (no lost update)") {
    // the cross-stream crash window: stream A stages+COMMITS from table
    // state T and dies before publish; stream B then applies a batch.
    // If B merged against T (without A's pending delta) and published,
    // A's recovery would later republish its stale snapshot over B's —
    // the lost update. The fix: every applyBatch first publishes ALL
    // tags' committed-unpublished staging, so B merges against T+A.
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-upsert-xstream-").toString
    val path = s"$root/state"
    def mk(tag: String) = new PartitionedUpsert(
      path, partCol = "p", keyCols = Seq("k"), sumCols = Seq("n"),
      aggregate = _.groupBy(col("p"), col("k"))
        .agg(sum(col("n")).as("n")),
      streamTag = tag)
    val a = mk("ingest")
    val b = mk("retract")
    a.applyBatch(Seq(("x", "k1", 10L)).toDF("p", "k", "n"), 0L)
    // A's batch 1: committed but NOT published (simulated crash)
    assert(a.stageAndCommit(Seq(("x", "k1", 5L)).toDF("p", "k", "n"), 1L))
    // B applies on the same partition: must see A's +5 first
    b.applyBatch(Seq(("x", "k1", -3L)).toDF("p", "k", "n"), 0L)
    val n = s.read.parquet(path).select(col("n")).head().getLong(0)
    assert(n === 12L) // 10 + 5 (recovered) - 3; the lost-update bug read 7
    // A's redelivered batch 1 is a marker no-op, not a double count
    a.applyBatch(Seq(("x", "k1", 5L)).toDF("p", "k", "n"), 1L)
    assert(s.read.parquet(path).select(col("n")).head().getLong(0) === 12L)
  }
}
