package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Z-order layout: Morton interleave hand-math, and the data-skipping
  * law — equal Z ranges have tight extents on BOTH dimensions, where a
  * one-column sort leaves the other dimension at full range. */
class LayoutSpec extends GraftSparkSpec {

  test("zValue interleaves bits (hand-computed case)") {
    // x=3 (b0,b1 set) -> positions 0,2 = 5; y=5 (b0,b2 set) -> positions 1,5 = 34
    val z = spark.range(1).select(Layout.zValue(lit(3), lit(5), 3)).head().getLong(0)
    assert(z === 39L)
  }

  test("equal Z ranges are squares: tight extents on both dimensions") {
    val grid = spark.range(64 * 64).select(
      (col("id") % 64).cast("int").as("x"),
      (col("id") / 64).cast("int").as("y"))
    val ext = Layout.zOrderExtents(grid, col("x"), col("y"), bits = 6, bucketBits = 4)
      .collect()
    assert(ext.length === 16)
    ext.foreach { r =>
      assert(r.getLong(1) === 256L) // n_rows per bucket
      assert(r.getLong(3) - r.getLong(2) === 15L) // x extent: 16-wide square
      assert(r.getLong(5) - r.getLong(4) === 15L) // y extent: 16-wide square
    }
    // contrast: bucketing the x-SORTED layout leaves y at full range
    val sortedExt = grid.withColumn("bucket", (col("x") / 4).cast("int")) // 16 x-range buckets
      .groupBy(col("bucket"))
      .agg(min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .collect()
    sortedExt.foreach(r => assert(r.getInt(2) - r.getInt(1) === 63))
  }

  test("skipRateReport hand-math on the uniform grid: central-fifth box " +
    "skips exactly 12/16 buckets under both layouts (the symmetric tie case)") {
    val grid = spark.range(64 * 64).select(
      (col("id") % 64).cast("int").as("x"),
      (col("id") / 64).cast("int").as("y"))
    // box = [63*2 DIV 5, 63*3 DIV 5] = [25, 37] on both dims. Z buckets
    // are 16x16 squares -> the 2x2 block of squares covering [16,47]^2
    // survives (4), 12 skip. x-sort strips are 4 columns wide -> strips
    // [24..39] survive (4), 12 skip. The uniform square grid with a
    // square box is the TIE case; on skewed real data only Z keeps both
    // dimensions tight (rel_zorder_skiprate: 874,666 vs 752,800 ppm).
    val got = Layout.skipRateReport(grid, col("x"), col("y"),
        bits = 6, bucketBits = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("zorder") === ((16L, 12L, 4096L, 3072L, 750000L)))
    assert(got("xsort") === ((16L, 12L, 4096L, 3072L, 750000L)))
  }

  test("compactionPlan: hand-math bins, next-fit bound, == single-window form") {
    val s = spark
    import s.implicits._
    // five 5-byte files, target 8: exclusive prefix sums 0,5,10,15,20
    // -> bins 0,0,1,1,2
    val five = (0 until 5).map(i => (i.toLong, 5L)).toDF("f", "bytes")
    val bins = Layout.compactionPlan(five, Seq(col("f")), col("bytes"), 8L)
      .orderBy(col("f")).select("bin").as[Long].collect().toSeq
    assert(bins === Seq(0L, 0L, 1L, 1L, 2L))
    // pseudo-random inventory: the plan must equal the one-reducer window
    // formulation exactly, and respect the next-fit packing bound
    val inv = spark.range(500).select(col("id").as("f"),
      (pmod(hash(col("id")), lit(4000)) + 1).cast("long").as("bytes"))
    val target = 10000L
    val got = Layout.compactionPlan(inv, Seq(col("f")), col("bytes"), target)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("f"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val oracle = inv.withColumn("bin",
      floor(coalesce(sum(col("bytes")).over(w), lit(0L)) / target))
    assert(got.select("f", "bin").exceptAll(oracle.select("f", "bin")).count() === 0)
    assert(oracle.select("f", "bin").exceptAll(got.select("f", "bin")).count() === 0)
    val perBin = got.groupBy("bin").agg(
      sum(col("bytes")).as("total"), max(col("bytes")).as("mx"))
    val maxFile = 4000L
    val lastBin = perBin.agg(max(col("bin"))).head().getLong(0)
    perBin.collect().foreach { r =>
      assert(r.getLong(1) < target + maxFile,
        s"bin ${r.getLong(0)} exceeds next-fit bound: ${r.getLong(1)}")
      if (r.getLong(0) != lastBin)
        assert(r.getLong(1) + maxFile > target,
          s"non-final bin ${r.getLong(0)} underfilled: ${r.getLong(1)}")
    }
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_dyn").toString
    Layout.overwritePartitions(
      Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("p", "v"),
      path, "p", dynamic = false)
    def partFiles(p: String): Set[String] =
      new java.io.File(s"$path/p=$p").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName + ":" + f.length).toSet
    val aBefore = partFiles("a")
    // merge a delta touching ONLY partition b
    Layout.overwritePartitions(Seq(("b", 9L)).toDF("p", "v"), path, "p")
    // untouched partition's files are byte-identical (same names+sizes —
    // a rewrite would mint new part-file UUIDs); a static overwrite
    // would have DELETED partition a entirely
    assert(partFiles("a") === aBefore)
    val rows = s.read.parquet(path).select(col("p").cast("string"), col("v"))
      .as[(String, Long)].collect().toSet
    assert(rows === Set(("a", 1L), ("a", 2L), ("b", 9L)))
  }
}
