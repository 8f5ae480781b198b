package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Behavior

/** Scratch profiler for local iteration (not part of the driver contract). */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, dir)
    time("events.count")(ev.count())
    time("events.count2")(ev.count())
    time("stack.count")(Behavior.fanoutMessages(ev).count())
    time("stack.count2")(Behavior.fanoutMessages(ev).count())
    time("get_json_object agg")(ev.groupBy(get_json_object(col("props"), "$.k")).count().count())
    time("get_json_object agg2")(ev.groupBy(get_json_object(col("props"), "$.k")).count().count())
    time("from_json agg")(ev.groupBy(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")).count().count())
    time("from_json agg2")(ev.groupBy(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")).count().count())
    time("distinct event_type")(ev.select(col("event_type")).distinct().count())
    time("distinct svc over stack")(
      Behavior.distinctServices(Behavior.fanoutMessages(ev)).count())
    time("distinct svc again")(
      Behavior.distinctServices(Behavior.fanoutMessages(ev)).count())
    time("value_counts")(Behavior.valueCounts(Behavior.fanoutMessages(ev)).count())
    time("value_counts2")(Behavior.valueCounts(Behavior.fanoutMessages(ev)).count())
    for (i <- 1 to 8) time(s"topic_totals $i")(Behavior.topicTotals(Behavior.fanoutMessages(ev)).count())
    spark.stop()
  }
}
