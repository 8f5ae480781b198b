package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

/** Hand-math golden tests for the navigation-path analytics registered in
  * RefQueries (`ref_path_trigrams`, `ref_gap_quantiles`): a tiny events
  * fixture written as parquet (the queries read via Tables.events, so the
  * fixture goes through the same scan path as the driver's tables; ts is
  * ns-since-epoch, the shared µs grain divides it down in-query). */
class PathAnalyticsSpec extends GraftSparkSpec {

  // (event_id, ts_ns, user_id, event_type): user 1 walks
  // click→view→click→cart at µs 1..4; user 2 clicks twice (µs 1, 2) —
  // too short for any trigram but contributing a same-type gap.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-pathspec-").toString
    val rows = Seq(
      (0L, 1000L, 1L, "click", 1.0, "{}"),
      (1L, 2000L, 1L, "view", 1.0, "{}"),
      (2L, 3000L, 1L, "click", 1.0, "{}"),
      (3L, 4000L, 1L, "cart", 1.0, "{}"),
      (4L, 1000L, 2L, "click", 1.0, "{}"),
      (5L, 2000L, 2L, "click", 1.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("ref_path_trigrams counts every ordered 3-step path once") {
    val out = SparkEntry.queries("ref_path_trigrams")(spark, dir).collect()
    // user 1 contributes exactly two trigrams; user 2 none (2 events).
    assert(out.toSeq === Seq(
      Row("click", "view", "click", 1L),
      Row("view", "click", "cart", 1L)))
  }

  test("ref_markov_eval: midpoint split, argmax tie-break, unseen-prev NULL") {
    // day span 0..3 → split day 2. Train pairs (day 0): (A,B),(B,A),(A,C)
    // → A predicts B (tie 1-1 broken to smallest), B predicts A.
    // Test pairs (day 2): (C,A) — C unseen as prev → NULL predicted,
    // (A,B) correct, (B,B) incorrect.
    def ns(day: Long, us: Long) = (day * 86400000000L + us) * 1000L
    val d = Files.createTempDirectory("graft-mkv-").toString
    val rows = Seq(
      (0L, ns(0, 1), 1L, "A", 1.0, "{}"), (1L, ns(0, 2), 1L, "B", 1.0, "{}"),
      (2L, ns(0, 3), 1L, "A", 1.0, "{}"), (3L, ns(0, 4), 1L, "C", 1.0, "{}"),
      (4L, ns(2, 1), 1L, "A", 1.0, "{}"), (5L, ns(2, 2), 1L, "B", 1.0, "{}"),
      (6L, ns(2, 3), 1L, "B", 1.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("ref_markov_eval")(spark, d).collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(got("A") === ((Some("B"), 1L, 1L, 1.0)))
    assert(got("B") === ((Some("A"), 1L, 0L, 0.0)))
    assert(got("C") === ((None, 1L, 0L, 0.0)))
  }

  test("ref_gap_quantiles cuts the gap histogram at ceil(p*N)") {
    val out = SparkEntry.queries("ref_gap_quantiles")(spark, dir).collect()
    // same-type gaps: click -> [2 µs (user 1: 1→3), 1 µs (user 2: 1→2)];
    // view/cart are singletons per user → no gap rows at all.
    // N=2: p50 rank ceil(1.0)=1 → smallest gap 1; p90 rank ceil(1.8)=2 → 2.
    assert(out.toSeq === Seq(Row("click", 2L, 1L, 2L, 2L)))
  }

  // user 3: clicks at µs 1, 2, 4 then purchase at µs 5 (all in window);
  // user 4: click 30 min + 1 µs before its purchase (outside window)
  private lazy val attrDir: String = {
    val d = Files.createTempDirectory("graft-attrspec-").toString
    val win = 1800L * 1000000L
    val rows = Seq(
      (10L, 1000L, 3L, "click", 1.0, "{}"),
      (11L, 2000L, 3L, "click", 1.0, "{}"),
      (12L, 4000L, 3L, "click", 1.0, "{}"),
      (13L, 5000L, 3L, "purchase", 1.0, "{}"),
      (14L, 0L, 4L, "click", 1.0, "{}"),
      (15L, (win + 1) * 1000L + 0L, 4L, "purchase", 1.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  // users 5-8 exercise every windowFunnel level: full chain in window,
  // purchase outside the view-anchored window, view-only, no view
  private lazy val funnelDir: String = {
    val d = Files.createTempDirectory("graft-wfspec-").toString
    val win = 1800L * 1000000L
    val rows = Seq(
      (20L, 1000L, 5L, "view", 1.0, "{}"),
      (21L, 2000L, 5L, "click", 1.0, "{}"),
      (22L, 3000L, 5L, "purchase", 1.0, "{}"),
      (23L, 1000L, 6L, "view", 1.0, "{}"),
      (24L, 2000L, 6L, "click", 1.0, "{}"),
      (25L, (win + 2) * 1000L, 6L, "purchase", 1.0, "{}"),
      (26L, 2000L, 7L, "click", 1.0, "{}"),
      (27L, 3000L, 7L, "view", 1.0, "{}"),
      (28L, 1000L, 8L, "error", 1.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("ref_window_funnel: level per user matches the strict-chain window rule") {
    val out = SparkEntry.queries("ref_window_funnel")(spark, funnelDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(5L -> 3, 6L -> 2, 7L -> 1, 8L -> 0))
  }

  test("ref_lorenz: decile cuts and exact cumulative shares on two users") {
    // dir fixture: user 1 has 4 events, user 2 has 2 → ranks 1, 2 of 2;
    // deciles (10·(rn−1)) DIV 2 + 1 = 1 and 6
    val out = SparkEntry.queries("ref_lorenz")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (1, 1L, 4L, 4L, 4.0 / 6.0, 4.0 / 6.0),
      (6, 1L, 2L, 6L, 2.0 / 6.0, 1.0)))
  }

  test("ref_attribution_linear: equal shares, remainder to most recent, window enforced") {
    val out = SparkEntry.queries("ref_attribution_linear")(spark, attrDir)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getInt(3), r.getLong(4)))).toMap
    // user 3's purchase 13: three touches → 333333 each + remainder 1
    // to the most recent click (event 12, recency rank 1)
    assert(out === Map(
      (13L, 10L) -> ((3, 333333L)),
      (13L, 11L) -> ((2, 333333L)),
      (13L, 12L) -> ((1, 333334L))))
    // total credit per purchase is exactly 1e6
    assert(out.collect { case ((13L, _), (_, c)) => c }.sum === 1000000L)
    // user 4's click is outside the 30-min window: no rows at all
    assert(!out.keys.exists(_._1 == 15L))
  }
}
