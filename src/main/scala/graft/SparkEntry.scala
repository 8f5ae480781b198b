package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a named operator from SURVEY.md §2 (or the
  * LLM-pipeline extension surface) expressed as a deterministic DataFrame
  * plan over the driver's parquet tables; `oracleSql` carries the equivalent
  * DuckDB SQL. Determinism rules (both sides):
  *   - explicit ORDER BY over the full output key;
  *   - aggregate/computed columns aliased to identical names;
  *   - integer-exact aggregation where possible; double sums go through
  *     DECIMAL casts (exact, engine-order-independent) then back to double.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's entire critical path (SURVEY §3 E2): scan → fan-out →
    * filter → hash agg → sort. */
  def entry(spark: SparkSession): DataFrame = {
    val msgs = Behavior.fanoutMessages(Tables.events(spark, "/root/testdata/sf0.001"))
    Behavior.clicksByService(msgs).orderBy(col("service"))
  }

  // ---------------------------------------------------------------------
  // Reference-parity family (SURVEY §2.2-§2.7) over `events`
  // ---------------------------------------------------------------------

  private def refQueries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "ref_value_counts" -> ((s, d) =>
      Behavior.valueCounts(Behavior.fanoutMessages(Tables.events(s, d)))
        .orderBy(col("topic"), col("value"))),
    "ref_topic_totals" -> ((s, d) =>
      Behavior.topicTotals(Behavior.fanoutMessages(Tables.events(s, d)))
        .orderBy(col("topic"))),
    "ref_clicks_by_service" -> ((s, d) =>
      Behavior.clicksByService(Behavior.fanoutMessages(Tables.events(s, d)))
        .orderBy(col("service"))),
    "ref_distinct_services" -> ((s, d) =>
      Behavior.distinctServices(Behavior.fanoutMessages(Tables.events(s, d)))
        .orderBy(col("service"))),
    "ref_dim_breakdown" -> ((s, d) =>
      Behavior.dimBreakdown(Behavior.fanoutMessages(Tables.events(s, d)))
        .orderBy(col("service"), col("dim"), col("value"))),
    "ref_pct_share" -> ((s, d) =>
      Behavior.pctShare(Behavior.fanoutMessages(Tables.events(s, d)))
        .orderBy(col("service"))),
    "ref_top_services" -> ((s, d) =>
      Behavior.topServices(Behavior.fanoutMessages(Tables.events(s, d)), 5)),
    "ref_clicks_by_segment" -> ((s, d) =>
      Behavior.clicksBySegment(Tables.events(s, d), Tables.customer(s, d))
        .orderBy(col("service"), col("segment"))),
    "ref_observed_topics" -> ((s, d) =>
      Behavior.observedTopics(Behavior.fanoutMessages(Tables.events(s, d)))
        .orderBy(col("topic"))),
  )

  /** The fan-out (`serwer.js:100-118`) as a DuckDB CTE: one wide event row →
    * 3 value-only topic messages, `home` dropped producer-side (P2). */
  private val msgsCte =
    """WITH msgs AS (
      |  SELECT event_type || '_k' AS topic, json_extract_string(props, '$.k') AS value FROM events WHERE event_type <> 'home'
      |  UNION ALL
      |  SELECT event_type || '_user' AS topic, CAST(user_id AS VARCHAR) AS value FROM events WHERE event_type <> 'home'
      |  UNION ALL
      |  SELECT event_type || '_clicks' AS topic, '1' AS value FROM events WHERE event_type <> 'home'
      |)""".stripMargin

  private val svcExpr =
    "regexp_replace(topic, '_(k|user|segment|nation|clicks)$', '')"
  private val dimExpr =
    "regexp_extract(topic, '_(k|user|segment|nation|clicks)$', 1)"

  private def refOracles: ListMap[String, String] = ListMap(
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
      s"""$msgsCte SELECT topic FROM (SELECT s.service || '_' || d.dim AS topic FROM (SELECT DISTINCT $svcExpr AS service FROM msgs) s CROSS JOIN (SELECT unnest(['k','user','clicks']) AS dim) d) e WHERE EXISTS (SELECT 1 FROM msgs m WHERE m.topic = e.topic) ORDER BY topic""",
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    refQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    refOracles
}
