package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet star schema + event/LLM tables
  * (see TESTDATA.md / FIXTURES.md). All engine queries take the sf
  * directory as a parameter so the same plan runs at any scale factor.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Loads `events` and normalizes `ts` to the engine-wide contract:
    * LongType nanoseconds since epoch. The upstream writer has shipped the
    * column as parquet TIMESTAMP(NANOS) (round ≤8) and as TIMESTAMP_MICROS
    * (round 9+) — a schema drift that a typed source must absorb centrally
    * rather than in 13 query sites (reference `Raport.py:62` is schemaless
    * and tolerant by construction; this is the typed equivalent). Branch on
    * the LOADED dtype:
    *   - LongType — parquet TIMESTAMP(NANOS) surfaced as an ns long via
    *     `nanosAsLong` (Spark's vectorized reader rejects NANOS otherwise);
    *     pass through.
    *   - TIMESTAMP / TIMESTAMP_NTZ — µs-precision; convert with
    *     `unix_micros(cast(ts as timestamp)) * 1000`. Exact: the session
    *     timezone is UTC everywhere in this engine, so the NTZ→LTZ cast is
    *     identity on the epoch value, and µs→ns is integer multiplication.
    * Every downstream `ts DIV 1000` site and every DuckDB `epoch_us(ts)`
    * oracle then agrees for BOTH schemas. Runtime SQLConf, so it works
    * under the driver's session too. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other; expected ns-long or timestamp")
    }
  }

  /** ns-since-epoch long → TimestampType (µs precision). Integral
    * division: Column `/` divides in DOUBLE, whose 2^53 mantissa cannot
    * represent ~1.7e18 ns exactly (±1 µs error on a few percent of rows). */
  def eventTime(ns: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    org.apache.spark.sql.functions.timestamp_micros(
      Bridge.column(IntegralDivide(Bridge.expression(ns), Literal(1000L))))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
