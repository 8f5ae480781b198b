package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Locks in the bench harness's deadline + stall defenses with a fake
  * clock — the code paths that saved round 10's artifact (provisional
  * pass-0 line, budget truncation with `"partial":true`, pass-1-failure
  * best-of retention) only fire under deadline/host pressure, which a
  * healthy real run never exercises. Pure JVM: no SparkSession.
  */
class BenchCoreSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def parse(line: String) = mapper.readTree(line)

  /** Harness over a fake clock: each runQuery(name) advances the clock
    * by the next duration (seconds) from `costs(name)`, cycling the last
    * value once exhausted. */
  private class Fake(costs: Map[String, Seq[Double]], budgetS: Double,
      prior: Map[String, Double] = Map.empty,
      failWhen: (String, Int) => Boolean = (_, _) => false) {
    var nowNs = 0L
    val calls = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val h = new BenchCore.Harness(
      costs.keys.toSeq.sorted,
      name => {
        val i = calls(name); calls(name) = i + 1
        if (failWhen(name, i)) sys.error(s"boom $name#$i")
        val cs = costs(name)
        nowNs += (cs(math.min(i, cs.size - 1)) * 1e9).toLong
      },
      () => nowNs, budgetS, prior)
  }

  test("healthy run: best-of map, ascending artifact order, all three lines parse") {
    val f = new Fake(Map("qa" -> Seq(3.0), "qb" -> Seq(1.0), "qc" -> Seq(2.0)), budgetS = 1e9)
    f.h.runPass(0); f.h.runPass(1)
    // pass 0 = warmup + 2 timed, pass 1 = warmup + 1 timed → 3 runs kept
    assert(f.h.allRuns("qb") === List(1.0, 1.0, 1.0))
    assert(f.h.nFailed === 0 && f.h.nUnmeasured === 0 && !f.h.truncated)
    assert(math.abs(f.h.total - 6.0) < 1e-9)
    val art = f.h.artifactLine("/sf", "", "")
    val j = parse(art)
    assert(j.get("value").asDouble === 6.0)
    // ascending-time order: cheap first, expensive last (truncation
    // from the head keeps the queries that dominate the total)
    val names = {
      val it = j.get("queries").fieldNames(); Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toList
    }
    assert(names === List("qb", "qc", "qa"))
    assert(parse(f.h.detailLine("/sf", "", "")).get("errors").isEmpty)
    val fin = parse(f.h.finalLine(""))
    assert(fin.get("n_queries").asInt === 3 && fin.get("n_failed").asInt === 0)
  }

  test("budget exceeded mid-pass-0: provisional + final lines flagged partial, unmeasured excluded from total") {
    // each query costs 10 s/run; pass-0 measures qa fully (warmup+2 =
    // t=30 s), then the budget check stops qb and qc before any run
    val f = new Fake(Map("qa" -> Seq(10.0), "qb" -> Seq(10.0), "qc" -> Seq(10.0)), budgetS = 25.0)
    f.h.runPass(0)
    assert(f.h.truncated)
    val prov = parse(f.h.artifactLine("/sf", "",
      s""""provisional_pass":0,${if (f.h.truncated) "\"partial\":true," else ""}"""))
    assert(prov.get("provisional_pass").asInt === 0)
    assert(prov.get("partial").asBoolean)
    // unmeasured queries report -1 in the map but do NOT pollute the total
    assert(prov.get("queries").get("qb").asDouble === -1.0)
    assert(prov.get("value").asDouble === 10.0) // best-of of qa's two timed 10 s runs
    f.h.runPass(1) // still over budget: no further measurement
    assert(f.h.nUnmeasured === 2 && f.h.allRuns.size === 1)
    val fin = parse(f.h.finalLine(s""""partial":true,"n_unmeasured":${f.h.nUnmeasured},"""))
    assert(fin.get("partial").asBoolean && fin.get("n_unmeasured").asInt === 2)
  }

  test("pass-1 failure keeps the valid pass-0 best-of; error still surfaces on the detail line") {
    // qa: 3 clean calls in pass 0 (warmup + 2 timed), every later call throws
    val f = new Fake(Map("qa" -> Seq(2.0)), budgetS = 1e9,
      failWhen = (n, i) => n == "qa" && i >= 3)
    f.h.runPass(0); f.h.runPass(1)
    assert(f.h.allRuns("qa") === List(2.0, 2.0)) // pass-0 runs retained
    assert(f.h.nFailed === 0)                    // NOT reported failed
    val det = parse(f.h.detailLine("/sf", "", ""))
    assert(det.get("errors").get("qa").asText.startsWith("RuntimeException"))
    assert(parse(f.h.finalLine("")).get("n_failed").asInt === 0)
  }

  test("no-success query reports -1 and counts failed") {
    val f = new Fake(Map("qa" -> Seq(1.0)), budgetS = 1e9, failWhen = (_, _) => true)
    f.h.runPass(0); f.h.runPass(1)
    assert(f.h.nFailed === 1 && f.h.total === 0.0)
    assert(parse(f.h.artifactLine("/sf", "", "")).get("queries").get("qa").asDouble === -1.0)
  }

  test("stall-suspect retries are bounded: at most 4 runs in pass 0, 2 in pass 1") {
    // first timed run 1 s, all later runs 10 s → runs.max > 2x best
    // forever, so only the bounded retry budget stops the loop
    val f = new Fake(Map("qa" -> Seq(1.0, 1.0, 10.0)), budgetS = 1e9)
    f.h.runPass(0)
    assert(f.h.allRuns("qa").size === 4)
    f.h.runPass(1)
    assert(f.h.allRuns("qa").size === 6) // + pass-1 timed + 1 retry
    assert(f.h.allRuns("qa").min === 1.0) // best-of survives the stall runs
    // the disagreeing runs surface on the detail line for adjudication
    val det = parse(f.h.detailLine("/sf", "", ""))
    assert(det.get("anomalous_runs").get("qa").size === 6)
  }

  test("3x-prior regression triggers bounded re-measure") {
    // steady 9 s runs vs prior 1 s → stallSuspect via the prior branch
    val f = new Fake(Map("qa" -> Seq(9.0)), budgetS = 1e9, prior = Map("qa" -> 1.0))
    f.h.runPass(0)
    assert(f.h.allRuns("qa").size === 4) // retried to the pass-0 cap
  }

  test("parsePrior reads this program's own artifact line") {
    val line = """{"metric":"total","unit":"sec","sf":"/sf","queries":{"qa":1.5,"qb":0.25},"value":1.75}"""
    assert(BenchCore.parsePrior(line) === Map("qa" -> 1.5, "qb" -> 0.25))
    assert(BenchCore.parsePrior("""{"no":"queries"}""") === Map.empty)
  }
}
