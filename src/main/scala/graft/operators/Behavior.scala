package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity user-behavior analytics (SURVEY.md §2, §7.1).
  *
  * The reference (`serwer.js:100-118`, `Raport.py:76-88`) encodes each click
  * as a 4-way fan-out onto dynamic Kafka topics named `{service}_{dim}` and
  * computes, every 60 s, cumulative value-frequency distributions per topic
  * (`Counter` = GROUP BY topic, value COUNT(*), `Raport.py:81`).
  *
  * Here the same semantics are expressed over the driver's `events` table
  * (event_type plays the reference's `service` role; the JSON prop `k`,
  * `user_id` and the constant `'1'` play the dimension values), as
  * declarative DataFrame plans Catalyst can optimize: the fan-out is a
  * single `stack` generator (no shuffle), every aggregate is a partial+final
  * hash aggregate, and the percentage share is a window function.
  *
  * Scale note (100 TB): all aggregations key on (topic, value) — bounded
  * cardinality (services × value domains), so partial aggregation collapses
  * the shuffle to near-nothing regardless of input size. No driver-side
  * loops; everything stays distributed.
  */
object Behavior {

  /** Dimension suffixes of the topic grammar (reference: age/city/gender/
    * clicks, `serwer.js:84-90`; here: k/user/clicks over `events`). */
  val dims: Seq[String] = Seq("k", "user", "segment", "clicks")

  private val dimAlt = "(k|user|segment|nation|clicks)"

  /** `{service}_{dim}` → service. SURVEY §2.3 F3: the reference's
    * `topic.split('_')[0]` mis-buckets services containing '_'; we strip the
    * known dim suffix instead (exact). */
  def serviceOf(topic: Column): Column =
    regexp_replace(topic, s"_$dimAlt$$", "")

  /** `{service}_{dim}` → dim. */
  def dimOf(topic: Column): Column =
    regexp_extract(topic, s"_$dimAlt$$", 1)

  /** Producer fan-out (S3/E1, `serwer.js:100-118`): one wide event → one
    * value-only message per dimension topic. `stack` is a Generator — a
    * narrow (no-shuffle) 1→3 row expansion. P2 (`topic === 'home'` drop,
    * `serwer.js:72-76`) applied producer-side.
    *
    * This 3-dimension overload serves callers without the user dimension
    * table (unit fixtures, bare streams); [[fanoutMessages(events,customer)*]]
    * is the reference-parity 4-message form. */
  def fanoutMessages(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") =!= "home")
      .select(
        col("event_type"),
        col("user_id"),
        // JsonFast: Jackson-free scalar extraction (see graft.functions.JsonFast)
        graft.functions.JsonFast.json_get(col("props"), "k").as("k"))
      .select(
        expr(
          "stack(3, " +
            "concat(event_type, '_k'), k, " +
            "concat(event_type, '_user'), cast(user_id as string), " +
            "concat(event_type, '_clicks'), '1') as (topic, value)"))

  /** Reference-parity fan-out: 4 messages per event (`serwer.js:100-118`
    * sends age, city, gender, clicks — one message per user attribute plus
    * the click counter). The user-attribute dimension (`segment`, the
    * market segment from the customer table) is joined producer-side as a
    * broadcast hash join — the 100 TB event side never shuffles; a LEFT
    * join so an event without a dimension row still fans out (coalesced to
    * 'unknown') rather than silently dropping a message. Works unchanged
    * as a stream-static join in Structured Streaming. */
  def fanoutMessages(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .filter(col("event_type") =!= "home")
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        events("user_id") === col("c_custkey"), "left")
      .select(
        col("event_type"),
        col("user_id"),
        graft.functions.JsonFast.json_get(col("props"), "k").as("k"),
        coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
      .select(
        expr(
          "stack(4, " +
            "concat(event_type, '_k'), k, " +
            "concat(event_type, '_user'), cast(user_id as string), " +
            "concat(event_type, '_segment'), segment, " +
            "concat(event_type, '_clicks'), '1') as (topic, value)"))

  /** A1 — THE core query (`Raport.py:76-88` `Counter` per topic):
    * GROUP BY topic, value → COUNT(*). */
  def valueCounts(msgs: DataFrame): DataFrame =
    msgs.groupBy(col("topic"), col("value"))
      .agg(count(lit(1)).as("cnt"))

  /** A2 — per-topic total (`Raport.py:148` `sum(counter.values())`):
    * rollup level of A1. */
  def topicTotals(msgs: DataFrame): DataFrame =
    valueCounts(msgs).groupBy(col("topic"))
      .agg(sum(col("cnt")).as("total"))

  /** A3 — clicks-per-service (`Raport.py:144-148`): filter `_clicks` topics
    * (P4), re-key by service (F3), sum counts. */
  def clicksByService(msgs: DataFrame): DataFrame =
    msgs.filter(col("topic").endsWith("_clicks"))
      .groupBy(serviceOf(col("topic")).as("service"))
      .agg(count(lit(1)).as("clicks"))

  /** A4 — distinct services (`Raport.py:165` `set(split[0])`). */
  def distinctServices(msgs: DataFrame): DataFrame =
    msgs.select(serviceOf(col("topic")).as("service")).distinct()

  /** A5 — per-service × dimension value breakdown (`Raport.py:168-201`):
    * the reference does 3N dict probes into A1's result; one grouped pass
    * here. P3 (`home` re-drop, `Raport.py:169-170`) retained for parity. */
  def dimBreakdown(msgs: DataFrame): DataFrame =
    msgs
      .select(serviceOf(col("topic")).as("service"),
        dimOf(col("topic")).as("dim"), col("value"))
      .filter(col("service") =!= "home")
      .filter(col("dim") =!= "clicks")
      .groupBy(col("service"), col("dim"), col("value"))
      .agg(count(lit(1)).as("cnt"))

  /** F6/A6 — percentage share of each service's clicks (the matplotlib
    * `autopct` denominator, `Raport.py:155`): sum-over-() analytic window.
    * Plain double division (no rounding) keeps the value bit-deterministic
    * across engines. Scale note: the unpartitioned window runs over the
    * service-level AGGREGATE (|services| rows — bounded by the topic
    * grammar, not the event count), so the single-partition exchange is a
    * few rows at any corpus size. */
  def pctShare(msgs: DataFrame): DataFrame =
    clicksByService(msgs)
      .withColumn("pct",
        (lit(100) * col("clicks")).cast("double") /
          sum(col("clicks")).over(Window.partitionBy()).cast("double"))

  /** §2.7 extension — deterministic top-k services by clicks (the reference
    * renders in dict order; golden-file testing needs ORDER BY). */
  def topServices(msgs: DataFrame, k: Int): DataFrame =
    clicksByService(msgs)
      .orderBy(col("clicks").desc, col("service"))
      .limit(k)

  /** J1 — producer-side dimension enrichment (`app.py:79-88` +
    * `templates.zip!index.html:64-66,179`) as a proper broadcast hash join:
    * events ⋈ users(customer). The dim side is small → broadcast, no
    * shuffle of the 100 TB fact side. */
  def enrichedClicks(events: DataFrame, customer: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .join(broadcast(customer), events("user_id") === customer("c_custkey"))

  /** J1 aggregate — clicks per service × market segment (the reference's
    * per-dimension pie, with the dimension joined rather than denormalized). */
  def clicksBySegment(events: DataFrame, customer: DataFrame): DataFrame =
    enrichedClicks(events, customer)
      .groupBy(col("event_type").as("service"), col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-user hour-of-day activity vector: 24 exact integer event counts,
    * cast double — the behavioral fingerprint that turns user-similarity
    * ("who browses like whom") into vector search over the existing
    * cosine kernels. Plan at scale: one (user, hour)-keyed partial
    * aggregate, one user-keyed assembly; the per-user state is a bounded
    * 24-entry map, never the event list. */
  def hourlyActivityVectors(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
        hour(graft.Tables.eventTime(col("ts"))).cast("int").as("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("h"), col("c")))).as("m"))
      .select(col("user_id"),
        transform(sequence(lit(0), lit(23)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("double"))
          .as("v"))

  /** J2 — semi-join (`Raport.py:177-178`): derived `{service}_{dim}` names
    * probed against observed topics. */
  def observedTopics(msgs: DataFrame): DataFrame = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val dimDf = dims.toDF("dim")
    val expected = distinctServices(msgs).crossJoin(dimDf)
      .select(concat(col("service"), lit("_"), col("dim")).as("topic"))
    expected.join(msgs.select(col("topic")).distinct(), Seq("topic"), "left_semi")
  }
}
