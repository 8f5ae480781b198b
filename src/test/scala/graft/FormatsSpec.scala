package graft

import org.apache.spark.sql.functions._

import graft.sources.Formats

/** Format round-trips are lossless and the partitioned read prunes. */
class FormatsSpec extends GraftSparkSpec {

  private def scratch(name: String): String =
    queries.QueryFamily.jvmScratch(s"fmtspec_$name")

  private lazy val src = spark.range(0, 1000).toDF("id")
    .withColumn("grp", (col("id") % 7).cast("int"))
    .withColumn("name", concat(lit("row,\"x\" #"), col("id")))
    .withColumn("cents", col("id") * 13)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("id").collect().map(_.mkString("|")).toIndexedSeq

  test("csv round-trip is lossless incl. quoted commas and quotes") {
    val back = Formats.roundtrip(spark, src, "csv", scratch("csv"),
      Map("header" -> "true"))
    // explicit schema applied, not inferred (file sources force nullable)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      src.schema.map(f => (f.name, f.dataType)))
    assert(canon(back) === canon(src))
  }

  test("json round-trip is lossless") {
    val back = Formats.roundtrip(spark, src, "json", scratch("json"))
    assert(canon(back) === canon(src))
  }

  test("orc round-trip is lossless and pushes filters") {
    val back = Formats.roundtrip(spark, src, "orc", scratch("orc"))
    assert(canon(back) === canon(src))
    val plan = back.filter(col("grp") === 3).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(grp), EqualTo(grp,3)]"), plan)
  }

  test("json quarantine: malformed lines split out, clean side parses fully") {
    val dir = scratch("quarantine")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val lines = Seq(
      """{"id": 1, "name": "a"}""",
      """{"id": 2 "name": "b"}""", // missing comma → malformed
      """{"id": 3, "name": "c"}""",
      """not json at all""",
      """{"id": "four", "name": "d"}""") // type mismatch → corrupt under typed schema
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-0.json"),
      String.join("\n", lines: _*).getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, name STRING")
    val (clean, quarantine) = Formats.readJsonQuarantine(spark, dir, schema)
    assert(clean.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (3L, "c")))
    // quarantine preserves the raw offending line for replay (keep a data
    // column in the projection: Spark disallows queries over ONLY the
    // internal corrupt-record column)
    val bad = quarantine.select(col("id"), col("_corrupt_record"))
      .collect().map(_.getString(1)).toSet
    assert(bad === Set(lines(1), lines(3), lines(4)))
  }

  test("partitioned round-trip prunes unmatched directories at planning time") {
    val back = Formats.partitionedRoundtrip(spark, src, "grp", scratch("part"))
    assert(back.count() === 1000)
    val pruned = back.filter(col("grp") === 3)
    // planning-time pruning: the executed scan visits 1 of 7 directories.
    // Read the metric off the SAME executed plan instance (a fresh .count()
    // builds its own QueryExecution whose metrics stay zero here).
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = pruned.queryExecution
    val got = qe.executedPlan.executeCollect().length
    assert(got.toLong === src.filter(col("grp") === 3).count())
    val scans = qe.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.head.toString.contains("PartitionFilters"), scans.head.toString)
    val selected = scans.head.metrics("numPartitions").value
    assert(selected === 1L, s"expected 1 selected partition, got $selected")
  }
}
