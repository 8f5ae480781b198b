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

  test("parquet codec matrix: zstd/snappy/gzip all round-trip losslessly") {
    // storage codec is a first-order 100 TB cost knob (zstd ≈ half of
    // snappy at similar scan speed); the engine must read back any of them
    for ((codec, suffix) <- Seq("zstd" -> "zstd", "snappy" -> "snappy",
        "gzip" -> "gz")) {
      val dir = scratch(s"codec_$codec")
      src.write.mode("overwrite").option("compression", codec).parquet(dir)
      val files = new java.io.File(dir).listFiles().map(_.getName)
      assert(files.exists(_.endsWith(s".$suffix.parquet")),
        s"$codec not applied: ${files.mkString(",")}")
      assert(canon(spark.read.parquet(dir)) === canon(src))
    }
  }

  test("schema evolution: mergeSchema unions late columns, early rows read null") {
    // landing prefixes drift: day N+1 adds a column. mergeSchema=true
    // reconciles footers at read; rows from the old files surface NULL.
    val dir = scratch("evolve")
    src.select("id", "grp").write.parquet(s"$dir/day=1")
    src.select(col("id"), col("grp"), col("cents"))
      .write.parquet(s"$dir/day=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "grp", "cents", "day"))
    assert(merged.filter(col("day") === 1 && col("cents").isNull).count() === 1000)
    assert(merged.filter(col("day") === 2).agg(sum("cents")).head.getLong(0)
      === src.agg(sum("cents")).head.getLong(0))
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
