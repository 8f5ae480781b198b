package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Behavior

/** Reference-parity family (SURVEY §2.2-§2.7) over `events`: the
  * {service}_{dim} topic-grammar analytics the reference computes every
  * 60 s (`Raport.py:76-201`). */
object RefQueries extends QueryFamily {

  private def msgs(s: SparkSession, d: String): DataFrame =
    Behavior.fanoutMessages(Tables.events(s, d), Tables.customer(s, d))

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "ref_value_counts" -> ((s, d) =>
      Behavior.valueCounts(msgs(s, d)).orderBy(col("topic"), col("value"))),
    "ref_topic_totals" -> ((s, d) =>
      Behavior.topicTotals(msgs(s, d)).orderBy(col("topic"))),
    "ref_clicks_by_service" -> ((s, d) =>
      Behavior.clicksByService(msgs(s, d)).orderBy(col("service"))),
    "ref_distinct_services" -> ((s, d) =>
      Behavior.distinctServices(msgs(s, d)).orderBy(col("service"))),
    "ref_dim_breakdown" -> ((s, d) =>
      Behavior.dimBreakdown(msgs(s, d))
        .orderBy(col("service"), col("dim"), col("value"))),
    "ref_pct_share" -> ((s, d) =>
      Behavior.pctShare(msgs(s, d)).orderBy(col("service"))),
    "ref_top_services" -> ((s, d) =>
      Behavior.topServices(msgs(s, d), 5)),
    "ref_clicks_by_segment" -> ((s, d) =>
      Behavior.clicksBySegment(Tables.events(s, d), Tables.customer(s, d))
        .orderBy(col("service"), col("segment"))),
    "ref_observed_topics" -> ((s, d) =>
      Behavior.observedTopics(msgs(s, d)).orderBy(col("topic"))),

    // T4-extension (batch form): sessionization by 30-min inactivity gap.
    // Exact integer ns arithmetic on the raw long timestamp — engine-order
    // independent. The streaming form is BehaviorStream.sessionCounts.
    "ref_sessions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val gapNs = 30L * 60 * 1000000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull || col("ts") - col("prev") > gapNs, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_ev"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events"),
          max(col("n_ev")).as("max_session_events"))
        .orderBy(col("user_id"))
    }),

    // Behavior funnel: view → later click → later purchase, per user,
    // exact ns-timestamp ordering (a capability the reference's
    // Counter-per-topic model cannot express).
    "ref_funnel" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val tv = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val tc = e.filter(col("event_type") === "click")
        .join(tv, Seq("user_id")).filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val tp = e.filter(col("event_type") === "purchase")
        .join(tc, Seq("user_id")).filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      // one declarative plan (1-row aggregates cross-joined), no
      // driver-side counting
      e.agg(countDistinct(col("user_id")).as("n_users"))
        .crossJoin(tv.agg(count(lit(1)).as("n_viewed")))
        .crossJoin(tc.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(tp.agg(count(lit(1)).as("n_full_funnel")))
    }),

    // event-time AS-OF attribution: each purchase → the latest click by
    // the same user at-or-before it, within a 30-min window. ONE pass:
    // the last-click candidate is a running max of a (ts, event_id)
    // struct over a user-partitioned window (per-user parallel sorts,
    // keyed shuffle — no join, no per-purchase scan). The struct max is
    // lexicographic in both engines, so same-timestamp clicks break ties
    // identically (highest event_id wins). Timestamps are floored to
    // exact integer µs — DuckDB's parquet reader preserves ns
    // (TIMESTAMP_NS); it's the oracle's epoch_us() conversion that
    // truncates to µs (floor for positive epochs, verified) — so gap
    // arithmetic and window order are engine-identical at the shared
    // µs grain. The stream-stream
    // form of this join (watermarked interval join) is StreamingSpec's
    // attribution law.
    "ref_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val windowUs = 1800L * 1000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lastClick = max(when(col("event_type") === "click",
        struct(col("tus").as("cts"), col("event_id").as("cid")))).over(w)
      val attributed = col("lc").isNotNull &&
        col("tus") - col("lc.cts") <= lit(windowUs)
      Tables.events(s, d)
        .withColumn("tus", expr("ts DIV 1000"))
        .withColumn("lc", lastClick)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          when(attributed, col("lc.cid")).as("click_id"),
          when(attributed, col("tus") - col("lc.cts")).as("gap_us"))
        .orderBy(col("purchase_id"))
    }),
  )

  /** The fan-out (`serwer.js:100-118`) as a DuckDB CTE: one wide event row →
    * 4 value-only topic messages (reference parity: one per user attribute
    * plus the click counter), `home` dropped producer-side (P2). */
  private val msgsCte =
    """WITH msgs AS (
      |  SELECT event_type || '_k' AS topic, json_extract_string(props, '$.k') AS value FROM events WHERE event_type <> 'home'
      |  UNION ALL
      |  SELECT event_type || '_user' AS topic, CAST(user_id AS VARCHAR) AS value FROM events WHERE event_type <> 'home'
      |  UNION ALL
      |  SELECT event_type || '_segment' AS topic, COALESCE(c_mktsegment, 'unknown') AS value
      |  FROM events LEFT JOIN customer ON user_id = c_custkey WHERE event_type <> 'home'
      |  UNION ALL
      |  SELECT event_type || '_clicks' AS topic, '1' AS value FROM events WHERE event_type <> 'home'
      |)""".stripMargin

  private val svcExpr =
    "regexp_replace(topic, '_(k|user|segment|nation|clicks)$', '')"
  private val dimExpr =
    "regexp_extract(topic, '_(k|user|segment|nation|clicks)$', 1)"

  val oracles: ListMap[String, String] = ListMap(
    "ref_value_counts" ->
      s"""$msgsCte SELECT topic, value, COUNT(*) AS cnt FROM msgs GROUP BY topic, value ORDER BY topic, value""",
    "ref_topic_totals" ->
      s"""$msgsCte SELECT topic, COUNT(*) AS total FROM msgs GROUP BY topic ORDER BY topic""",
    "ref_clicks_by_service" ->
      s"""$msgsCte SELECT $svcExpr AS service, COUNT(*) AS clicks FROM msgs WHERE ends_with(topic, '_clicks') GROUP BY 1 ORDER BY 1""",
    "ref_distinct_services" ->
      s"""$msgsCte SELECT DISTINCT $svcExpr AS service FROM msgs ORDER BY service""",
    "ref_dim_breakdown" ->
      s"""$msgsCte SELECT service, dim, value, COUNT(*) AS cnt FROM (SELECT $svcExpr AS service, $dimExpr AS dim, value FROM msgs) t WHERE service <> 'home' AND dim <> 'clicks' GROUP BY service, dim, value ORDER BY service, dim, value""",
    "ref_pct_share" ->
      s"""$msgsCte SELECT service, clicks, CAST(100 * clicks AS DOUBLE) / CAST(SUM(clicks) OVER () AS DOUBLE) AS pct FROM (SELECT $svcExpr AS service, COUNT(*) AS clicks FROM msgs WHERE ends_with(topic, '_clicks') GROUP BY 1) t ORDER BY service""",
    "ref_top_services" ->
      s"""$msgsCte SELECT $svcExpr AS service, COUNT(*) AS clicks FROM msgs WHERE ends_with(topic, '_clicks') GROUP BY 1 ORDER BY clicks DESC, service LIMIT 5""",
    "ref_clicks_by_segment" ->
      """SELECT event_type AS service, c_mktsegment AS segment, COUNT(*) AS cnt FROM events JOIN customer ON user_id = c_custkey WHERE event_type = 'click' GROUP BY 1, 2 ORDER BY 1, 2""",
    "ref_observed_topics" ->
      s"""$msgsCte SELECT topic FROM (SELECT s.service || '_' || d.dim AS topic FROM (SELECT DISTINCT $svcExpr AS service FROM msgs) s CROSS JOIN (SELECT unnest(['k','user','segment','clicks']) AS dim) d) e WHERE EXISTS (SELECT 1 FROM msgs m WHERE m.topic = e.topic) ORDER BY topic""",
    "ref_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events),
        |m AS (SELECT user_id, event_id, tns,
        |        CASE WHEN lag(tns) OVER w IS NULL OR tns - lag(tns) OVER w > 1800000000000 THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
        |s AS (SELECT user_id, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM m),
        |g AS (SELECT user_id, session_id, COUNT(*) AS n_ev FROM s GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_ev) AS BIGINT) AS n_events, MAX(n_ev) AS max_session_events FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "ref_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
        |tv AS (SELECT user_id, MIN(tns) AS t_view FROM e WHERE event_type = 'view' GROUP BY 1),
        |tc AS (SELECT e.user_id, MIN(tns) AS t_click FROM e JOIN tv ON e.user_id = tv.user_id WHERE event_type = 'click' AND tns > t_view GROUP BY 1),
        |tp AS (SELECT e.user_id, MIN(tns) AS t_purchase FROM e JOIN tc ON e.user_id = tc.user_id WHERE event_type = 'purchase' AND tns > t_click GROUP BY 1)
        |SELECT (SELECT COUNT(DISTINCT user_id) FROM e) AS n_users, (SELECT COUNT(*) FROM tv) AS n_viewed, (SELECT COUNT(*) FROM tc) AS n_view_click, (SELECT COUNT(*) FROM tp) AS n_full_funnel""".stripMargin,
    "ref_attribution" ->
      """SELECT purchase_id, user_id, click_id, gap_us FROM (
        |  SELECT event_id AS purchase_id, user_id, event_type,
        |    CASE WHEN lc IS NOT NULL AND tus - lc.cts <= 1800000000 THEN lc.cid END AS click_id,
        |    CASE WHEN lc IS NOT NULL AND tus - lc.cts <= 1800000000 THEN tus - lc.cts END AS gap_us
        |  FROM (
        |    SELECT event_id, user_id, event_type, tus,
        |      max(CASE WHEN event_type = 'click' THEN {'cts': tus, 'cid': event_id} END)
        |        OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS lc
        |    FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events) e) t) p
        |WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin,
  )
}
