package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dumps `.explain("formatted")` for a list of registered queries to
  * `<outDir>/<name>_<tag>.txt` — the optimization-round before/after plan
  * evidence (plans/r16/). One JVM for the whole list, unlike
  * [[ExplainOne]]'s per-query launch.
  *
  * Usage: ExplainMany <outDir> <tag> <name>[,name...] [sfDir] [shuffle]
  * Matches Bench's session shape (AQE on, 64m broadcast threshold) so the
  * dumped INITIAL plan is the one Bench's executions start from.
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val parts = args.lift(4).getOrElse("32")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      System.err.println(s"[explain] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
