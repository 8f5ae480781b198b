package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables
import graft.streaming.CardinalityScreen

/** Scratch profiler for local iteration (not part of the driver contract).
  * Round 15: decompose the gov_* e2e streaming queries' per-run cost —
  * source write vs stream replay (per micro-batch) vs read-back/compare —
  * to find where the ~5 s/run floor lives.
  */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = Tables.events(spark, dir).select(
      date_format(Tables.eventTime(col("ts")), "yyyy-MM-dd").as("day"),
      col("event_type"), col("user_id"))

    val root = sys.props("java.io.tmpdir") + "/graft_profile_gov"
    def rm(p: String): Unit = graft.queries.QueryFamily.clearScratch(p)
    rm(root)
    val src = s"$root/src"
    time("source write")(rows.repartition(3).write.parquet(src))
    val schema = spark.read.parquet(src).schema

    for (round <- 1 to 3) {
      val state = s"$root/state$round"
      val q = time(s"r$round stream start") {
        CardinalityScreen.maintainDistincts(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src), state)
          .option("checkpointLocation", s"$root/cp$round")
          .trigger(Trigger.AvailableNow())
          .start()
      }
      time(s"r$round stream replay")(q.awaitTermination())
      time(s"r$round read-back") {
        val exact = rows.groupBy(col("day"), col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        CardinalityScreen.estimates(spark, state)
          .join(exact, Seq("day", "event_type"))
          .count()
      }
    }
    // how much of the replay is micro-batch machinery? same fold as ONE
    // batch (whole source in a single trigger)
    val state1 = s"$root/state_single"
    val q1 = CardinalityScreen.maintainDistincts(
      spark.readStream.schema(schema).parquet(src), state1)
      .option("checkpointLocation", s"$root/cp_single")
      .trigger(Trigger.AvailableNow())
      .start()
    time("single-batch replay")(q1.awaitTermination())
    // strip Structured Streaming out entirely: drive the SAME upsert
    // directly with the three files as hand batches
    val stateD = s"$root/state_direct"
    val files = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    for ((f, i) <- files.zipWithIndex)
      time(s"direct applyBatch $i") {
        CardinalityScreen.applyBatch(spark.read.parquet(f), stateD, i.toLong)
      }
    time("direct read-back")(CardinalityScreen.estimates(spark, stateD).count())
    // decompose one applyBatch's pieces by hand
    val b0 = spark.read.parquet(files(0))
    val delta = b0.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        hll_sketch_agg(col("user_id")).as("users_sk")).persist()
    time("piece: delta materialize")(delta.count())
    time("piece: parts collect")(
      delta.select(col("day").cast("string")).distinct().collect())
    val stg = s"$root/stg_probe"
    time("piece: staged write") {
      delta.write.mode("overwrite").partitionBy("day").parquet(stg)
    }
    time("piece: staged write 2") {
      delta.write.mode("overwrite").partitionBy("day").parquet(stg)
    }
    time("piece: staged write c1") {
      delta.coalesce(1).write.mode("overwrite").partitionBy("day").parquet(stg)
    }
    time("piece: plain write c1") {
      delta.coalesce(1).write.mode("overwrite").parquet(s"$root/stg_plain")
    }
    time("piece: noop count")(delta.count())
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    time("piece: part write v2") {
      delta.coalesce(1).write.mode("overwrite").partitionBy("day").parquet(stg)
    }
    time("piece: part write v2 b") {
      delta.coalesce(1).write.mode("overwrite").partitionBy("day").parquet(stg)
    }
    delta.unpersist()
    rm(root)
    spark.stop()
  }
}
