package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.GraftSparkSpec

/** Hand-math goldens for [[Dedup.exactSubstrCoverage]] (Lee et al.
  * ExactSubstr at L=16): cross-document repeats at different offsets,
  * multiple disjoint spans per doc, WITHIN-document repetition (the
  * suffix-array formulation is position-blind, so ours must be too), and
  * absence of unique docs. */
class ExactSubstrSpec extends GraftSparkSpec {

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-substr-").toString
    val r1 = toks("r", 18) // shared 18-token run → 3 L-windows
    val r2 = toks("s", 16) // shared 16-token run → 1 L-window
    val t = toks("t", 16)  // doc C's internal repeat
    val docA = (toks("u", 5) ++ r1 ++ toks("v", 10) ++ r2).mkString(" ")
    val docB = (r2 ++ toks("w", 6) ++ r1).mkString(" ")
    val docC = (t ++ toks("x", 4) ++ t).mkString(" ")
    val docD = toks("z", 20).mkString(" ")
    val rows = Seq(
      (0L, docA, "en", "web", docA.length.toLong),
      (1L, docB, "en", "web", docB.length.toLong),
      (2L, docC, "en", "web", docC.length.toLong),
      (3L, docD, "en", "web", docD.length.toLong))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("coverage accounting: offsets, disjoint spans, within-doc repeats") {
    val out = graft.SparkEntry.queries("dd_substring")(spark, dir).collect()
    // doc A: r1 covers pos 5..22 (18 tokens), r2 covers 33..48 (16) —
    //        window starts 5,6,7 and 33; gap 26 > 16 keeps them apart
    // doc B: r2 at 0..15, r1 at 22..39 — same runs, different offsets
    // doc C: t at 0..15 and 20..35, BOTH sides of the within-doc repeat
    // doc D: unique → absent
    assert(out.toSeq === Seq(
      Row(0L, 49L, 2L, 34L, 34.0 / 49.0),
      Row(1L, 40L, 2L, 34L, 34.0 / 40.0),
      Row(2L, 36L, 2L, 32L, 32.0 / 36.0)))
  }
}
