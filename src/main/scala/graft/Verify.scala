package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Deadline defense (round 12 lost its ENTIRE correctness artifact — the
  * driver recorded `{}`): two layers, mirroring Bench's.
  *   1. oracle_sql.json (and the partial-run marker) are written BEFORE
  *      the query loop. A mid-run SIGTERM now leaves a comparable
  *      artifact — the already-dumped queries verify, the missing dirs
  *      surface as per-query errors — instead of an oracle-less dump the
  *      driver can only score as zero.
  *   2. Queries run on a small thread pool over the shared SparkSession
  *      (`SPARK_GRAFT_VERIFY_THREADS`, default 8). At sf0.01 the data is
  *      ~2 MB, so per-query wall is dominated by planning + Janino codegen
  *      + stage scheduling, which overlap across threads; the serial run
  *      measured 784 s on an idle host, uncomfortably close to a driver
  *      timeout once contention doubles it. Spark actions are thread-safe;
  *      each query writes its own output dir, so results are unchanged.
  *      Cache hygiene: `clearCache()` every 32 completions (not per-query
  *      — a concurrent clear only costs a recompute, never correctness)
  *      keeps dedup-family `cache()` blocks from accumulating. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated name prefixes for local iteration (same
    // contract as Bench); unset = full driver run. Filters BOTH the query
    // dumps and oracle_sql.json so tools/check.py sees a consistent pair.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    def keep(name: String): Boolean = only.forall(_.exists(name.startsWith))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Partial-run marker (mirrors Bench's "only" tag): a filtered run
    // overwrites oracle_sql.json with a subset, and WITHOUT a marker the
    // stale full-run parquet dumps sitting next to it would make the
    // partial artifact look like a complete verification. A sibling file
    // (not a key inside oracle_sql.json — the driver iterates that file's
    // keys as query names) records the active filter; a full run deletes
    // any stale marker so it can't mislabel a complete artifact either.
    val marker = Paths.get(s"$outDir/_partial_run.json")
    only match {
      case Some(p) =>
        Files.writeString(marker, s"""{"only": ${q(p.mkString(","))}}""")
      case None => Files.deleteIfExists(marker)
    }
    val nThreads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8").toInt
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val tasks = SparkEntry.queries.filter(kv => keep(kv._1)).map {
      case (name, fn) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val t0 = System.nanoTime()
            try {
              fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                .parquet(s"$outDir/$name")
              val s = (System.nanoTime() - t0) / 1e9
              System.err.println(f"[verify] $name ok $s%.1fs")
            } catch { case e: Throwable =>
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
            if (done.incrementAndGet() % 32 == 0) spark.catalog.clearCache()
          }
        })
    }
    // Global deadline (3rd layer): a single wedged query (host stall, codegen
    // livelock) must not hold the artifact hostage past the driver's own
    // timeout — the driver SIGKILLs and records `{}`. On breach: cancel all
    // Spark jobs, abandon the pool, exit 0. Finished dumps verify; the
    // stragglers surface as per-query errors instead of a zeroed round.
    val deadlineS = sys.env.getOrElse("SPARK_GRAFT_VERIFY_DEADLINE_S", "2700").toLong
    val deadlineNs = System.nanoTime() + deadlineS * 1000000000L
    val timedOut = tasks.exists { t =>
      val leftMs = (deadlineNs - System.nanoTime()) / 1000000L
      try { t.get(math.max(leftMs, 1L), java.util.concurrent.TimeUnit.MILLISECONDS); false }
      catch { case _: java.util.concurrent.TimeoutException => true }
    }
    if (timedOut) {
      System.err.println(s"[verify] DEADLINE ${deadlineS}s breached — cancelling stragglers")
      spark.sparkContext.cancelAllJobs()
      pool.shutdownNow(): Unit
    } else pool.shutdown()
    spark.stop()
    // a straggler thread ignoring its interrupt must not block JVM exit
    if (timedOut) sys.exit(0)
  }
}
