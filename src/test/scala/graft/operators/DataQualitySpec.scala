package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Hand-math tests for the data-contract audit: every check kind exercised
  * with violations that actually fire (and one clean check, since
  * certifying cleanliness is half the audit's job). */
class DataQualitySpec extends GraftSparkSpec {

  private lazy val child = spark.createDataFrame(Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (99L, "orphan"))).toDF("fk", "payload")
  private lazy val parent = spark.createDataFrame(Seq(
    (1L, "p"), (2L, "p"), (3L, "p"), (3L, "dup"))).toDF("pk", "name")

  test("columnChecks fuses checks into one pass and counts conditionally") {
    val df = spark.createDataFrame(Seq(
      (1L, 10.0), (2L, 250.0), (3L, 300.0), (4L, -1.0))).toDF("id", "v")
    val out = DataQuality.columnChecks(df, Seq(
      "v_over_200" -> (col("v") > 200),
      "v_negative" -> (col("v") < 0))).collect()
    assert(out.toSet === Set(
      Row("v_over_200", 4L, 2L), Row("v_negative", 4L, 1L)))
  }

  test("columnChecks: a null condition row is non-violating") {
    val df = spark.createDataFrame(Seq(
      (1L, Some(5.0)), (2L, None: Option[Double]))).toDF("id", "v")
    val out = DataQuality.columnChecks(df,
      Seq("v_over_1" -> (col("v") > 1))).collect()
    assert(out.toSeq === Seq(Row("v_over_1", 2L, 1L)))
  }

  test("columnChecks rejects injectable and reserved check names loudly") {
    val df = spark.createDataFrame(Seq((1L, 5.0))).toDF("id", "v")
    // a quote would break the interpolated stack() expression; a
    // backtick the agg alias; n_rows collides with the count alias
    for (bad <- Seq("x'y", "x`y", "n_rows", "a b")) {
      val e = intercept[IllegalArgumentException] {
        DataQuality.columnChecks(df, Seq(bad -> (col("v") > 1)))
      }
      assert(e.getMessage.contains(bad) || bad == "n_rows")
    }
  }

  test("fkCheck counts orphans (null keys included) out of one joined pass") {
    val out = DataQuality.fkCheck("fk", child, col("fk"), parent, col("pk"))
      .collect()
    assert(out.toSeq === Seq(Row("fk", 4L, 1L))) // only 99 is orphaned
  }

  test("uniqueCheck reads duplicate excess off the grouped frame") {
    val out = DataQuality.uniqueCheck("uq", parent, col("pk")).collect()
    assert(out.toSeq === Seq(Row("uq", 4L, 1L))) // pk=3 appears twice
  }

  test("audit unions checks ordered by name with the exact share") {
    val out = DataQuality.audit(Seq(
      DataQuality.fkCheck("a_fk", child, col("fk"), parent, col("pk")),
      DataQuality.uniqueCheck("b_uq", parent, col("pk")))).collect()
    assert(out.toSeq === Seq(
      Row("a_fk", 4L, 1L, 0.25), Row("b_uq", 4L, 1L, 0.25)))
  }

  test("observedMetrics ride the driven job and see every row exactly once") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("k", "v").repartition(3) // metrics must merge across tasks
    var driven = 0L
    val m = DataQuality.observedMetrics(df,
      Seq(count(lit(1)).as("n"), sum(col("v")).as("sv"), max(col("k")).as("mk")),
      observed => driven = observed.groupBy(col("k") % 2).count().count())
    assert(driven === 2L) // the driven action really ran (2 parity groups)
    assert(m("n") === 4L && m("sv") === 100L && m("mk") === 4L)

    // a second drive over a NEW observation is independent (no leakage)
    val m2 = DataQuality.observedMetrics(df.filter(col("k") <= 2),
      Seq(count(lit(1)).as("n")), _.agg(count(lit(1))).collect())
    assert(m2("n") === 2L)
  }

  test("observedMetrics rejects an empty metric list") {
    val e = intercept[IllegalArgumentException] {
      DataQuality.observedMetrics(parent, Seq.empty, _ => ())
    }
    assert(e.getMessage.contains("at least one metric"))
  }

  test("kAnonymity: hand-math class sizes, k flag boundary, ppm ceiling") {
    // classes: (a,x)×3, (a,y)×1, (b,x)×7 — with k=3 only the singleton
    // violates; the flag is strict (< k), so the size-3 class passes
    val rows = spark.createDataFrame(Seq(
      ("a", "x", 1), ("a", "x", 2), ("a", "x", 3),
      ("a", "y", 4),
      ("b", "x", 5), ("b", "x", 6), ("b", "x", 7), ("b", "x", 8),
      ("b", "x", 9), ("b", "x", 10), ("b", "x", 11)))
      .toDF("qi1", "qi2", "id")
    val got = DataQuality.kAnonymity(rows, Seq(col("qi1"), col("qi2")), 3)
      .orderBy(col("qi1"), col("qi2"))
      .select(col("qi1"), col("qi2"), col("class_size"), col("violates_k"),
        col("reident_ppm"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      ("a", "x", 3L, 0, 333333L),
      ("a", "y", 1L, 1, 1000000L),
      ("b", "x", 7L, 0, 142857L)))

    val e = intercept[IllegalArgumentException] {
      DataQuality.kAnonymity(rows, Seq.empty, 3)
    }
    assert(e.getMessage.contains("quasi-identifier"))
  }
}
