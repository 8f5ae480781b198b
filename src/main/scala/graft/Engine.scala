package graft

import org.apache.spark.sql.SparkSession

/** User-facing entry point: one call wires a session to the engine —
  * every table registered as a temp view (SQL-first usage, the S2
  * catalog-discovery analog) and the native functions registered under
  * their SQL names. A user of the reference switches by pointing `attach`
  * at their data directory and writing the same aggregations in SQL or
  * the DataFrame API.
  */
object Engine {

  /** Recommended session for this engine (mirrors Bench/Verify config).
    *
    * `rocksdbState = true` swaps streaming state to the RocksDB provider:
    * state lives off-heap/on-disk per executor instead of in the JVM
    * heap, which is what keeps long-horizon stateful queries (cumulative
    * Complete-mode aggregates, wide dedup watermarks) viable when state
    * outgrows executor memory — the 100 TB setting. Default stays on the
    * in-memory HDFS-backed provider: at reference-shape state (≤48 topics
    * × small value domains) it is strictly faster. */
  def session(appName: String = "graft", cores: Int = 32,
      rocksdbState: Boolean = false): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // 10 MB default is tuned for small heaps; with 100+ GiB executors a
      // 64 MB build side is still a cheap broadcast and keeps dimension /
      // shingle-set sides off the shuffle (AQE demotes anything bigger).
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
    if (rocksdbState) b.config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register every parquet table under `dir` as a temp view + register
    * native SQL functions. Returns the table names registered. */
  def attach(spark: SparkSession, dir: String): Seq[String] = {
    graft.functions.GraftFunctions.register(spark)
    Tables.all.filter { t =>
      new java.io.File(s"$dir/$t.parquet").exists()
    }.map { t =>
      // events must go through Tables.events (TIMESTAMP(NANOS) handling)
      val df = if (t == "events") Tables.events(spark, dir) else Tables(spark, dir, t)
      df.createOrReplaceTempView(t)
      t
    }
  }
}
