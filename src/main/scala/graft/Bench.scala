package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: executes every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query gets one untimed warmup execution (absorbs Janino codegen +
  * JIT compilation, which otherwise dominates sub-second queries), then at
  * least two timed executions driven to completion via count().
  *
  * Stall defense: this host exhibits intermittent multi-second JVM stalls
  * (documented in prior rounds' verdicts — identical runs vary 0.3 s vs
  * 80 s; round 7's artifact recorded 8-27x phantom regressions on
  * byte-identical code). Three countermeasures, stall-proof BY
  * CONSTRUCTION per the round-7 verdict:
  *   1. TWO full interleaved passes over the registry — alphabetical,
  *      then reverse-alphabetical — keeping each query's MIN across all
  *      runs of both passes. A sustained stall window hits *different*
  *      queries in the two passes (opposite run order), so no single
  *      window can inflate one query family's best-of in both.
  *   2. COVERAGE-FIRST (round 13 — round 12's contended run burned its
  *      budget on in-pass retries and left 45 queries unmeasured): each
  *      coverage pass takes exactly warmup + ONE timed run per query;
  *      stall suspects (merged runs disagree >2x, or best-of exceeds 3x
  *      the prior round's value from BENCH_PRIOR.json) are re-measured
  *      in a FINAL bounded retry phase, most-suspicious first, spending
  *      only leftover budget. Bounded retries mean a real regression
  *      still surfaces; a stall does not — and can no longer starve the
  *      rest of the registry.
  *   3. Per-run times of queries whose merged runs disagreed (plus any
  *      exception messages) are emitted as a SECOND short JSON line
  *      AFTER the main artifact line — the driver captures a bounded
  *      TAIL of stdout, so the detail that makes stall-vs-regression
  *      decidable always survives truncation (round 7 lost it by
  *      putting the detail first on one long line).
  *
  * Output is three JSON lines: (1) the full artifact with the per-query
  * map (time-ascending, so truncation eats only cheap queries), (2) the
  * anomaly/error detail, (3) an ULTRA-SHORT scalars-only total line —
  * last so a consumer that JSON-parses the final line of a bounded tail
  * always succeeds.
  *
  * Deadline defense (round 9 lost its ENTIRE artifact to the driver's
  * timeout — rc=124, SIGTERM mid-run, nothing on stdout): two layers.
  *   1. An internal wall-clock budget (`SPARK_GRAFT_BENCH_BUDGET_S`,
  *      default 2400 s — under any plausible driver timeout). When the
  *      budget is exceeded, measurement STOPS — remaining queries and
  *      retries are skipped — and the three artifact lines are emitted
  *      with `"partial":true` plus an `n_unmeasured` count, so a slow
  *      host degrades to a partial artifact instead of no artifact.
  *   2. A PROVISIONAL artifact line (same schema, flagged
  *      `"provisional_pass":0`) printed the moment pass 0 completes, and
  *      flushed — so even a hard external SIGTERM during pass 1 leaves
  *      one complete parseable line on stdout. The final three lines
  *      print later and supersede it for any consumer that reads the
  *      LAST parseable line of the tail.
  */
object Bench {
  /** Prior-round per-query seconds from BENCH_PRIOR.json if the file
    * exists (one JSON line in this program's own output format; parsing
    * in [[BenchCore.parsePrior]]). `SPARK_GRAFT_PRIOR` overrides the
    * path; `off` disables the prior entirely — the scaling sweeps run
    * this same binary at 10× data, where the sf0.1 prior would flag
    * every query a 3×-regression suspect and burn the retry budget. */
  private def loadPriorFile(): String = {
    val path = sys.env.getOrElse("SPARK_GRAFT_PRIOR", "BENCH_PRIOR.json")
    if (path == "off") return ""
    val f = new java.io.File(path)
    if (!f.isFile) return ""
    try scala.io.Source.fromFile(f, "UTF-8").mkString
    catch { case _: Throwable => "" }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE (default = cpus, the driver's config): the
    // scaling sweeps run this binary at 10x data with shuffle partitions
    // scaled alongside — the knob every real deployment turns with data
    // size (SCALING.md §"Fixed-parallelism drift").
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      // HEAP-SIZE IMMUNITY (round 16): Spark's ContextCleaner purges
      // shuffle files / broadcasts / localCheckpoint RDDs from a GC
      // reference queue, so a launcher that hands this JVM a huge heap
      // (-Xmx96g) that never fills never GCs, the cleaner never fires,
      // and 240 queries of accumulated state (7,800+ threads observed,
      // r15) crawl the back half of the run 10-90x. tools/run_main.sh
      // bounds ITS heap to 8g, but the driver launches graft.Bench
      // directly — this periodic System.gc() (Spark's own knob, default
      // 30min) makes the cleaner fire on any heap every 60s.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val priorText = loadPriorFile()
    // parse failures degrade to an empty prior, never a startup crash —
    // update_prior.py writes BENCH_PRIOR.json non-atomically, and a
    // truncated file taking down Bench before the first query would be
    // the round-9 no-artifact mode all over again
    val prior =
      try BenchCore.parsePrior(priorText)
      catch { case _: Throwable => Map.empty[String, Double] }
    val coldFloor =
      try BenchCore.parseColdFloor(priorText)
      catch { case _: Throwable => Map.empty[String, Double] }
    // optional comma-separated name prefixes for local iteration
    // (e.g. SPARK_GRAFT_ONLY=dd_,sim_); unset = full driver run.
    // SPARK_GRAFT_SKIP excludes exact names — the scaling harness uses
    // it to leave out the declared O(n²) oracle baselines whose blowup
    // at 10× data is by design (each has a registered bucketed scale
    // path that IS measured).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(',').toSet).getOrElse(Set.empty[String])
    val selected = SparkEntry.queries.toSeq.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) && !skip.contains(name)
    }.sortBy(_._1)
    val fnByName = selected.toMap
    // internal deadline, kept under the driver's kill timeout so the
    // artifact always prints from inside the JVM (see scaladoc)
    val wallBudgetS = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_S")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(2400.0)
    // PER-QUERY wall cap (round 13): the budget check in BenchCore fires
    // BETWEEN queries, so one wedged execution could previously absorb
    // the entire budget (observed: a contended-host graph query crawling
    // at localCheckpoint granularity for >20 min). A watchdog timer
    // cancels the query's Spark job group after capS — count() throws,
    // the harness records the error (or keeps the other pass's clean
    // run), and coverage of the remaining registry is preserved. The cap
    // is ~37x the slowest clean sf0.1 query, so only true pathology
    // (stall, wedge, runaway plan) is ever cut.
    val capS = sys.env.get("SPARK_GRAFT_QUERY_CAP_S")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(150.0)
    val watchdog = new java.util.Timer("bench-query-cap", true)
    // JVM-thread canary (round 16): the r15 accumulated-state pathology
    // announced itself as monotonic thread growth (7,800+ live threads by
    // the dd_ family). Sample the live thread count after every query;
    // warn on stderr each time it crosses another +500, and report the
    // per-family max at the end — so a future BENCH artifact that reads
    // slow in the back half carries its own heap-pathology evidence.
    val familyThreads = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    @volatile var threadWarnAt = 1000
    def sampleThreads(name: String): Unit = {
      val n = Thread.activeCount()
      val fam = name.takeWhile(_ != '_')
      familyThreads(fam) = math.max(familyThreads.getOrElse(fam, 0), n)
      if (n >= threadWarnAt) {
        threadWarnAt = n + 500
        System.err.println(s"[bench-canary] live threads=$n after $name")
      }
    }
    def runCapped(name: String): Unit = {
      val sc = spark.sparkContext
      val group = s"bench-$name"
      // interruptOnCancel frees the executor threads too (a cancelled
      // cartesian-ish stage would otherwise keep all 32 cores busy as
      // zombies, crawling every subsequent measurement)
      sc.setJobGroup(group, s"bench per-query cap ${capS}s", interruptOnCancel = true)
      @volatile var fired = false
      val tt = new java.util.TimerTask {
        def run(): Unit = { fired = true; sc.cancelJobGroup(group) }
      }
      watchdog.schedule(tt, (capS * 1000).toLong)
      try { fnByName(name)(spark, sfDir).count(); () }
      catch { case e: Throwable =>
        if (fired) throw new RuntimeException(f"capped>$capS%.0fs", e) else throw e
      } finally { tt.cancel(); sc.clearJobGroup(); sampleThreads(name) }
    }
    // measurement mechanics (two passes, best-of, stall retries, budget
    // truncation) + artifact-line builders live in BenchCore.Harness so
    // the deadline defenses are unit-tested with a fake clock
    val h = new BenchCore.Harness(
      selected.map(_._1),
      runCapped,
      () => System.nanoTime(),
      wallBudgetS,
      prior,
      // release per-query cache() blocks (dedup operators) so runs
      // don't accumulate; each pass's warmup repopulates them, keeping
      // every timed run warm-cache (the methodology of every prior
      // round's artifact; cold timings measured ~4x higher on the
      // cache-heavy dd_ queries and are not comparable)
      afterEach = () => spark.catalog.clearCache(),
      // e2e streaming queries (gov_*) replay their whole stream from
      // batch 0 every run — a warmup is a wasted third replay
      noWarmup = SparkEntry.noWarmupQueries,
      // degraded-visit expected cost for the cache_class queries (their
      // single cold run legitimately reads up to ~15x warm prior) — see
      // the recovery-window scaladoc in BenchCore
      coldPrior = coldFloor)
    val onlyTag = only.map(p => s""""only":"${p.mkString(",")}",""").getOrElse("")
    h.runPass(0)
    // deadline insurance: one complete parseable line on stdout the
    // moment pass 0 is done, before pass 1 risks the driver timeout
    println(h.artifactLine(sfDir, onlyTag,
      s""""provisional_pass":0,${if (h.truncated) "\"partial\":true," else ""}${if (h.degraded) "\"degraded\":true," else ""}"""))
    System.out.flush()
    h.runPass(1)
    println(h.artifactLine(sfDir, onlyTag,
      s""""provisional_pass":1,${if (h.truncated) "\"partial\":true," else ""}${if (h.degraded) "\"degraded\":true," else ""}"""))
    System.out.flush()
    // leftover budget only: bounded re-measure of stall suspects
    // (coverage-first — round 12 lost 45 queries to in-pass retries)
    h.retryPass()
    // healthy-host-only third coverage pass: sharpen best-of samples
    h.polishPass()
    // thread canary summary (stderr — diagnostic, not part of the
    // 3-line artifact contract the driver parses)
    System.err.println("[bench-canary] per-family max live threads: " +
      familyThreads.map { case (f, n) => s"$f=$n" }.mkString(" "))
    // a deadline-truncated run is labelled so its partial total can't be
    // mistaken for a full benchmark artifact; unmeasured != failed
    val partialTag =
      (if (h.truncated) s""""partial":true,"n_unmeasured":${h.nUnmeasured},""" else "") +
        (if (h.degraded) """"degraded":true,""" else "")
    // The consumer keeps only a bounded TAIL of stdout (~2000 chars —
    // observed in BENCH_r07.json) and the full-registry queries map is
    // ~3500 chars, so the map's HEAD is always truncated away.
    // artifactLine emits the map sorted by ASCENDING time: the entries
    // that get cut are the cheapest sub-second queries, and the slow
    // queries that dominate the total — the ones any regression read
    // needs — always survive at the end of the line, right before
    // "value". JSON maps carry no key-order semantics; this only
    // controls what truncation keeps.
    val artifact = h.artifactLine(sfDir, onlyTag, partialTag)
    println(artifact)
    // SECOND, SHORT line: per-run detail for queries whose merged runs
    // disagreed by >2x (a stall or a bimodal plan), harness wall seconds
    // (warmups + all runs of both passes + retries — wall >> value is the
    // signature of a stalled host), and the headline total again. Emitted
    // AFTER the main line so the bounded stdout tail always keeps it
    // whole — and if the consumer JSON-parses the tail's last line, it
    // gets this complete, valid object instead of a truncated fragment.
    val detail = h.detailLine(sfDir, onlyTag, partialTag)
    println(detail)
    // THIRD, ULTRA-SHORT final line (~80 chars): guaranteed to be the
    // last line of the bounded stdout tail AND short enough that a JSON
    // parse of that last line always succeeds outright, even though the
    // full queries map above exceeds the tail. Scalars only.
    println(h.finalLine(partialTag))
    // SELF-CONTAINED ARTIFACT FILE (round 14): the driver preserves only
    // the last ~2000 chars of stdout, which truncates the full per-query
    // map (~3500 chars) — r13's verdict could floor-compare just 34 of
    // 234 queries. Persist the three artifact lines to a repo file too,
    // so the complete result survives regardless of stdout capture. The
    // write is atomic-rename (temp + move) and best-effort: a read-only
    // CWD must not fail the benchmark itself. SPARK_GRAFT_BENCH_OUT
    // overrides the path; "off" disables (the scaling sweeps redirect it
    // so a 10x-data run can't overwrite the sf0.1 artifact).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_last.json")
    if (outPath != "off") {
      // temp in the TARGET's directory (same filesystem — ATOMIC_MOVE
      // across mounts always fails), deleted on any failure path
      val target = java.nio.file.Paths.get(outPath).toAbsolutePath.normalize
      var tmp: java.nio.file.Path = null
      try {
        tmp = java.nio.file.Files.createTempFile(
          target.getParent, ".bench_last", ".tmp")
        java.nio.file.Files.write(tmp,
          (artifact + "\n" + detail + "\n" + h.finalLine(partialTag) + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch { case e: Throwable =>
        System.err.println(s"bench_last write skipped: ${e.getMessage}")
        if (tmp != null)
          try java.nio.file.Files.deleteIfExists(tmp)
          catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
