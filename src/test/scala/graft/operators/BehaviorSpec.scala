package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Golden micro-fixture tests for the reference-parity analytics
  * (FIXTURES.md §A4): hand-computed counts over a known event set,
  * including the `home` drop (P2, serwer.js:72-76) and "None"-style
  * values (§1.2 quirk). */
class BehaviorSpec extends GraftSparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val events = {
    val rows = Seq(
      // event_id, user_id, event_type, props
      (0L, 1L, "click", """{"k": 7}"""),
      (1L, 1L, "click", """{"k": 7}"""),
      (2L, 2L, "click", """{"k": 9}"""),
      (3L, 2L, "view", """{"k": 7}"""),
      (4L, 3L, "home", """{"k": 1}"""), // must be dropped (P2)
      (5L, 3L, "view", """{}"""), // missing k -> null value
    )
    spark.createDataFrame(rows).toDF("event_id", "user_id", "event_type", "props")
  }

  private lazy val msgs = Behavior.fanoutMessages(events).cache()

  test("fan-out emits 3 messages per non-home event (S3 topic grammar)") {
    assert(msgs.count() === 15) // 5 events x 3 dims
    assert(msgs.filter(col("topic").startsWith("home")).count() === 0)
    val topics = msgs.select("topic").distinct().as[String](spark.implicits.newStringEncoder)
      .collect().toSet
    assert(topics === Set("click_k", "click_user", "click_clicks",
      "view_k", "view_user", "view_clicks"))
  }

  test("A1 value counts match hand computation") {
    val vc = Behavior.valueCounts(msgs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(vc(("click_k", "7")) === 2)
    assert(vc(("click_k", "9")) === 1)
    assert(vc(("click_clicks", "1")) === 3)
    assert(vc(("view_clicks", "1")) === 2)
    // missing k: null value group still counted
    assert(vc.exists { case ((t, v), c) => t == "view_k" && v == null && c == 1L })
  }

  test("A2 rollup consistency: sum of A1 counts per topic == topic totals") {
    val fromA1 = Behavior.valueCounts(msgs).groupBy("topic")
      .agg(sum("cnt").as("total"))
    val a2 = Behavior.topicTotals(msgs)
    assert(fromA1.exceptAll(a2).count() === 0)
    assert(a2.exceptAll(fromA1).count() === 0)
  }

  test("A3 clicks-by-service: sum == count since '_clicks' value is constant '1'") {
    val cbs = Behavior.clicksByService(msgs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cbs === Map("click" -> 3, "view" -> 2))
  }

  test("A4/A5: distinct services and dim breakdown drop clicks dim") {
    assert(Behavior.distinctServices(msgs).count() === 2)
    val bd = Behavior.dimBreakdown(msgs)
    assert(bd.filter(col("dim") === "clicks").count() === 0)
    assert(bd.filter(col("dim") === "k" && col("service") === "click").count() === 2)
  }

  test("F6 percentage shares sum to 100") {
    val total = Behavior.pctShare(msgs).agg(sum("pct")).head().getDouble(0)
    assert(math.abs(total - 100.0) < 1e-9)
  }

  test("F3 service parsing strips only the known dim suffix") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("topic", StringType)))
    val odd = spark.createDataFrame(
      Seq(Row("googlekubernetes_clicks"), Row("foo_bar_clicks"), Row("a_user")).asJava, schema)
    val parsed = odd.select(Behavior.serviceOf(col("topic"))).collect().map(_.getString(0))
    assert(parsed.toSeq === Seq("googlekubernetes", "foo_bar", "a"))
  }

  test("hourly activity vectors: 24 dense counts from sparse (user, hour) events") {
    val s = spark
    import s.implicits._
    val h = 3600L * 1000 * 1000 * 1000 // one hour in ns
    // user 1: two events in hour 0, one in hour 23; user 2: one in hour 5
    val ev = Seq(
      (1L, 0L), (1L, 30L * 60 * 1000 * 1000 * 1000), (1L, 23L * h),
      (2L, 5L * h + 42L))
      .toDF("user_id", "ts")
    val vecs = Behavior.hourlyActivityVectors(ev).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs(1L).length === 24)
    assert(vecs(1L)(0) === 2.0 && vecs(1L)(23) === 1.0)
    assert(vecs(1L).sum === 3.0) // nothing leaks into other buckets
    assert(vecs(2L)(5) === 1.0 && vecs(2L).sum === 1.0)
  }
}
