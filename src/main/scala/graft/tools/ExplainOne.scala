package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints ONE registered query's formatted physical plan to stdout —
  * the single-query iteration loop behind [[Explain]]'s PLANS.md dump:
  * `runMain graft.tools.ExplainOne <name> [sfDir] [shufflePartitions]`.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ExplainOne <queryName> [sfDir] [shufflePartitions]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val parts = args.lift(2).getOrElse("8")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
