package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.queries.QueryFamily

/** File-directory streaming source: incremental pickup, per-trigger
  * backpressure, and exactly-once across a checkpointed restart. */
class FileIngestSpec extends GraftSparkSpec {

  private def mkdirs(p: String): String = { Files.createDirectories(Paths.get(p)); p }

  test("dead-letter routing: malformed stream lines quarantined per batch, " +
    "clean rows aggregate correctly") {
    val s = spark
    val root = QueryFamily.jvmScratch("dead_letter")
    val landing = mkdirs(s"$root/landing")
    val dead = s"$root/dead"
    val goodA = (1 to 8).map(i => s"""{"id": $i, "user": "u${i % 2}"}""")
    val badA = Seq("""{"id": 9 "user": "u1"}""", "garbage")
    Files.write(Paths.get(s"$landing/a.json"),
      String.join("\n", (goodA ++ badA): _*).getBytes)

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, user STRING")
    val seen = scala.collection.mutable.Map.empty[String, Long]
    val q = DeadLetter.jsonDirStream(s, landing, schema)
      .writeStream.option("checkpointLocation", s"$root/chk")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        DeadLetter.route(batch, id, dead) { clean =>
          clean.groupBy(col("user")).count().collect()
            .foreach(r => seen(r.getString(0)) =
              seen.getOrElse(r.getString(0), 0L) + r.getLong(1))
        }
      }.start()
    try {
      q.processAllAvailable()
      assert(seen === Map("u0" -> 4L, "u1" -> 4L))
      val quarantined = s.read.parquet(dead).collect().map(_.getString(0)).toSet
      assert(quarantined === badA.toSet)
    } finally q.stop()
  }

  test("tails a parquet directory incrementally and survives restart " +
    "without reprocessing (exactly-once)") {
    val s = spark
    import s.implicits._
    val root = QueryFamily.jvmScratch("file_ingest")
    val landing = mkdirs(s"$root/landing")
    val checkpoint = s"$root/chk"

    def land(ids: Range): Unit =
      ids.map(i => (i.toLong, s"u${i % 3}")).toDF("id", "user")
        .coalesce(1).write.mode("append").parquet(landing)

    land(0 until 10)
    val schema = s.read.parquet(landing).schema

    def start(name: String) = FileIngest.parquetDirStream(s, landing, schema, 2)
      .groupBy(col("user")).agg(count(lit(1)).as("n"), sum(col("id")).as("id_sum"))
      .writeStream.queryName(name)
      .outputMode("complete").format("memory")
      .option("checkpointLocation", checkpoint).start()

    def snapshot(name: String): Map[String, (Long, Long)] =
      s.sql(s"SELECT * FROM $name").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val q1 = start("fi_a")
    try {
      q1.processAllAvailable()
      assert(snapshot("fi_a").values.map(_._1).sum === 10L)
      land(10 until 16)
      q1.processAllAvailable()
      val snap = snapshot("fi_a")
      assert(snap.values.map(_._1).sum === 16L)
      assert(snap.values.map(_._2).sum === (0 until 16).map(_.toLong).sum)
    } finally q1.stop()

    // restart from the checkpoint: previously-committed files must NOT be
    // re-read; only the new landing file enters the state
    land(16 until 20)
    val q2 = start("fi_b")
    try {
      q2.processAllAvailable()
      val snap = snapshot("fi_b")
      assert(snap.values.map(_._1).sum === 20L)
      assert(snap.values.map(_._2).sum === (0 until 20).map(_.toLong).sum)
    } finally q2.stop()
  }

  test("AvailableNow backfill: drains the landing prefix in paced batches, " +
    "stops itself, and a later invocation picks up only new files") {
    // the nightly-backfill pattern: streaming exactly-once + backpressure
    // semantics, batch-job lifecycle — the query processes everything
    // available (still honoring maxFilesPerTrigger pacing, unlike
    // Trigger.Once) and terminates; the cron re-invocation resumes from
    // the same checkpoint and reads only what landed in between
    val s = spark
    import s.implicits._
    val root = graft.queries.QueryFamily.jvmScratch("file_ingest_an")
    val landing = mkdirs(s"$root/landing")
    val checkpoint = s"$root/chk"

    def land(ids: Range): Unit =
      ids.map(i => (i.toLong, s"u${i % 3}")).toDF("id", "user")
        .coalesce(1).write.mode("append").parquet(landing)

    land(0 until 4); land(4 until 8); land(8 until 10) // 3 landing files
    val schema = s.read.parquet(landing).schema

    def runOnce(name: String): Long = {
      val q = FileIngest.parquetDirStream(s, landing, schema, maxFilesPerTrigger = 1)
        .groupBy(col("user")).agg(sum(col("id")).as("id_sum"))
        .writeStream.queryName(name)
        .outputMode("complete").format("memory")
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), s"$name did not self-terminate")
      q.recentProgress.count(_.numInputRows > 0)
    }

    val batches1 = runOnce("fi_an_a")
    assert(batches1 >= 3) // 3 files at maxFilesPerTrigger=1 → paced batches
    val sum1 = s.sql("SELECT SUM(id_sum) FROM fi_an_a").head().getLong(0)
    assert(sum1 === (0 until 10).map(_.toLong).sum)

    // second invocation: only the newly landed file is read (the
    // checkpointed file-source log skips the committed ones), and the
    // restored state carries the earlier totals forward
    land(10 until 14)
    runOnce("fi_an_b")
    val sum2 = s.sql("SELECT SUM(id_sum) FROM fi_an_b").head().getLong(0)
    assert(sum2 === (0 until 14).map(_.toLong).sum)
  }
}
