package graft

import graft.tools.PlanFingerprint

/** Whole-registry plan-shape drift gate: every registered query's
  * physical-operator multiset must match the checked-in golden file
  * (PLAN_FINGERPRINTS.txt). PlanSpec pins 16 shapes in detail
  * (pushdown strings, join sides); this catches the OTHER ~200 against
  * silent broadcast→SMJ flips, codegen-span loss, or extra exchanges.
  * Regenerate after an INTENTIONAL plan change with:
  * `sbt "runMain graft.tools.PlanFingerprint"` and review the diff like
  * code. */
class PlanFingerprintSpec extends GraftSparkSpec {

  test("all registered queries match their golden plan fingerprints") {
    val goldenFile = new java.io.File(PlanFingerprint.goldenPath)
    assert(goldenFile.isFile,
      s"${PlanFingerprint.goldenPath} missing — run graft.tools.PlanFingerprint")
    val golden = PlanFingerprint.parse(
      java.nio.file.Files.readString(goldenFile.toPath))
    val got = PlanFingerprint.fingerprintAll(spark, "/root/testdata/sf0.001")

    val missing = golden.keySet -- got.map(_._1).toSet
    val unpinned = got.map(_._1).toSet -- golden.keySet
    val drifted = got.filter { case (n, f) => golden.get(n).exists(_ != f) }
      .map { case (n, f) =>
        s"$n\n  golden: ${golden(n)}\n  actual: $f"
      }
    val report = Seq(
      if (missing.nonEmpty)
        Some(s"golden queries no longer registered: ${missing.toSeq.sorted.mkString(", ")}")
      else None,
      if (unpinned.nonEmpty)
        Some(s"registered queries missing from golden (regenerate): ${unpinned.toSeq.sorted.mkString(", ")}")
      else None,
      if (drifted.nonEmpty)
        Some(s"plan drift:\n${drifted.mkString("\n")}")
      else None).flatten
    assert(report.isEmpty, "\n" + report.mkString("\n"))
  }
}
