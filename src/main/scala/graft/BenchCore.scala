package graft

import scala.collection.mutable

/** The benchmark harness logic of [[Bench]], extracted pure so the
  * deadline/stall defenses are unit-testable with a fake clock (the
  * round-9 failure mode — driver rc=124 SIGTERM leaving NO artifact —
  * is insured against by code paths that only fire under deadline
  * pressure, which a real bench run never exercises on a healthy host;
  * `BenchCoreSpec` drives them deterministically).
  *
  * [[Bench.main]] owns only the Spark session and stdout; everything
  * below is deterministic given the injected `runQuery` + `nowNanos`.
  */
private[graft] object BenchCore {

  def fmt(v: Double): String =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  /** Parse prior-round per-query seconds from one artifact line in this
    * program's own output format. Hand-rolled regex keeps the dependency
    * surface at zero; the file is machine-written so the simple
    * `"name":number` shape is reliable.
    */
  def parsePrior(text: String): Map[String, Double] = {
    val qStart = text.indexOf("\"queries\":{")
    if (qStart < 0) return Map.empty
    val qEnd = text.indexOf('}', qStart)
    val body = text.substring(qStart, if (qEnd < 0) text.length else qEnd)
    val pair = """"([A-Za-z0-9_]+)":(-?[0-9.Ee+-]+)""".r
    pair.findAllMatchIn(body).collect {
      case m if m.group(1) != "queries" => m.group(1) -> m.group(2).toDouble
    }.toMap
  }

  /** Two-pass best-of measurement with stall retries and an internal
    * wall-clock budget. See [[Bench]]'s scaladoc for the methodology
    * rationale; the mechanics live here.
    *
    * @param selected alphabetical query names (pass 0 order; pass 1 runs
    *                 the reverse)
    * @param runQuery executes one query to completion (warmup and timed
    *                 runs use the same thunk)
    * @param nowNanos injectable clock; both the budget check and the
    *                 per-run timing read it
    * @param budgetS  wall seconds after which measurement STOPS and the
    *                 artifact is flagged partial
    * @param prior    prior-round per-query seconds (3x-regression retry
    *                 trigger)
    * @param afterEach cleanup after every query (cache release)
    */
  final class Harness(
      selected: Seq[String],
      runQuery: String => Unit,
      nowNanos: () => Long,
      budgetS: Double,
      prior: Map[String, Double],
      afterEach: () => Unit = () => ()) {

    // merged per-query run times across both passes (insertion order =
    // alphabetical, the order the artifact reports)
    val allRuns: mutable.LinkedHashMap[String, List[Double]] =
      mutable.LinkedHashMap[String, List[Double]]()
    // name -> first exception message. A query is only REPORTED failed
    // (-1.0) when it has NO successful runs at all: a query that
    // measured cleanly in pass 0 and threw in pass 1 (transient host/FS
    // hiccup) keeps its valid pass-0 best-of, and the error message
    // still surfaces on the detail line.
    val errors: mutable.LinkedHashMap[String, String] =
      mutable.LinkedHashMap[String, String]()
    var truncated = false

    private val t0 = nowNanos()
    def wallS: Double = (nowNanos() - t0) / 1e9
    def overBudget: Boolean = wallS > budgetS

    /** pass 0: alphabetical, warmup + 2 timed runs (+ up to 2 retries);
      * pass 1: reverse-alphabetical, warmup + 1 timed run (+ up to 1
      * retry). The warmup each pass repopulates the per-query caches
      * that `afterEach` released, so every timed run is warm-cache.
      */
    def runPass(pass: Int): Unit =
      for (name <- if (pass == 0) selected else selected.reverse) {
        if (overBudget) truncated = true
        else try {
          runQuery(name) // warmup: codegen + JIT + cache fill
          def timedRun(): Double = {
            val s = nowNanos()
            runQuery(name)
            (nowNanos() - s) / 1e9
          }
          val runs = mutable.ArrayBuffer(timedRun())
          if (pass == 0 && !overBudget) runs += timedRun()
          def best: Double = (runs ++ allRuns.getOrElse(name, Nil)).min
          def stallSuspect: Boolean =
            runs.max > 2.0 * best ||
              prior.get(name).exists(p => p > 0 && best > 3.0 * p)
          val budget = if (pass == 0) 4 else 2
          while (stallSuspect && runs.size < budget && !overBudget) runs += timedRun()
          allRuns(name) = allRuns.getOrElse(name, Nil) ++ runs.toList
        } catch {
          case e: Throwable => errors.getOrElseUpdate(name,
            (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
              .replaceAll("[\"\\\\\n\r\t]", " ").take(120))
        }
        finally afterEach()
      }

    /** (name, best-of seconds or -1.0 if never measured, all runs) */
    def currentResults: Seq[(String, Double, List[Double])] =
      selected.map { name =>
        val rs = allRuns.getOrElse(name, Nil)
        if (rs.isEmpty) (name, -1.0, List.empty[Double])
        else (name, rs.min, rs)
      }

    def total: Double = currentResults.map(_._2).filter(_ >= 0).sum

    /** queries that never got a run AND never threw — deadline-skipped,
      * distinct from failed */
    def nUnmeasured: Int =
      currentResults.count(r => r._3.isEmpty && !errors.contains(r._1))

    def nFailed: Int = currentResults.count(_._2 < 0)

    /** Line-1 builder, shared by the provisional pass-0 emission and the
      * final artifact (the only difference is the extra flag fields).
      * The map is sorted by ASCENDING time so the consumer's bounded
      * stdout tail truncates only the cheapest queries.
      */
    def artifactLine(sfDir: String, onlyTag: String, extraFields: String): String = {
      val results = currentResults
      val qs = results.sortBy(_._2).map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","unit":"sec","sf":"$sfDir",$onlyTag$extraFields"queries":$qs,"value":${fmt(total)}}"""
    }

    /** Line 2: per-run detail for queries whose merged runs disagreed by
      * >2x (stall or bimodal plan), all error messages, and harness wall
      * seconds (wall >> value is the stalled-host signature). */
    def detailLine(sfDir: String, onlyTag: String, partialTag: String): String = {
      val perRun = currentResults.collect {
        case (k, _, rs) if rs.nonEmpty && rs.max > 2.0 * rs.min =>
          "\"" + k + "\":[" + rs.map(fmt).mkString(",") + "]"
      }.mkString("{", ",", "}")
      val errJson = errors.map { case (k, m) => "\"" + k + "\":\"" + m + "\"" }
        .mkString("{", ",", "}")
      s"""{"anomalous_runs":$perRun,"errors":$errJson,"wall":${fmt(wallS)},"sf":"$sfDir",$onlyTag$partialTag"value":${fmt(total)}}"""
    }

    /** Line 3: ultra-short scalars-only final line — always survives the
      * bounded tail whole, so a JSON parse of the last line succeeds. */
    def finalLine(partialTag: String): String =
      s"""{"metric":"total","unit":"sec",$partialTag"value":${fmt(total)},"n_queries":${currentResults.size},"n_failed":$nFailed}"""
  }
}
