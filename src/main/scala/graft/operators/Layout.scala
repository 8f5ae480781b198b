package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for data
  * skipping.
  *
  * A 100 TB table can only be range-clustered on ONE sort key; queries
  * filtering on a second column then scan everything. The classic fix is
  * a space-filling curve: interleave the bits of both (bucketed) columns
  * into a single Z-VALUE and range-cluster on that — every Z range is a
  * rectangle-ish region of the 2-D key space, so parquet row-group
  * min/max stats stay TIGHT on BOTH columns and either predicate skips
  * most of the file (the Delta/Iceberg `ZORDER BY` layout, from public
  * descriptions of Morton curves).
  *
  * Everything here is exact integer bit arithmetic — identical in any
  * engine, no floats anywhere. */
object Layout {

  /** Morton/Z-value: the low `bits` bits of non-negative `x` and `y`
    * interleaved (x on even positions, y on odd). A flat OR-fold of
    * 2·bits shift/mask terms — whole-stage-codegen'd long arithmetic,
    * no UDF. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val terms =
      (0 until bits).map(i => shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i)) ++
        (0 until bits).map(i => shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1))
    terms.reduce(_ bitwiseOR _).cast("long")
  }

  /** Z-order clustering-quality report: each dimension is linearly
    * scaled to the full `bits`-bit range by its corpus min/max (what
    * production ZORDER implementations do — without it a
    * narrow-domain column contributes only dead zero bits and the curve
    * degenerates to a one-dimensional sort), rows are laid on the Morton
    * curve, cut into `2^bucketBits` equal Z ranges (the row-group / file
    * proxy), and each range reports its row count and min/max extents on
    * both ORIGINAL dimensions — the stats a scan would prune on. Tight
    * per-bucket extents on both columns simultaneously are the signature
    * of a multi-dimensionally prunable layout (a single-column sort gives
    * tight extents on one dimension and full-range extents on the
    * other — LayoutSpec asserts exactly that contrast).
    *
    * Scaling is exact integer arithmetic: `(v−mn)·(2^bits−1) DIV (mx−mn)`
    * — engine-portable, no floats. The min/max pass is one tiny
    * broadcast; everything else is narrow projection + one hash
    * aggregate. At production scale the same z column feeds
    * `repartitionByRange($"z").sortWithinPartitions($"z").write` so the
    * layout lands in parquet row-group stats; here the report IS the
    * observable, engine-portable artifact. */
  def zOrderExtents(df: DataFrame, x: Column, y: Column, bits: Int,
      bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits, "bucketBits in [1, 2*bits]")
    val top = (1L << bits) - 1
    val raw = df.select(x.cast("long").as("xr"), y.cast("long").as("yr"))
    val stats = raw.agg(min(col("xr")).as("xmn"), max(col("xr")).as("xmx"),
      min(col("yr")).as("ymn"), max(col("yr")).as("ymx"))
    raw.crossJoin(broadcast(stats))
      .select(col("xr"), col("yr"),
        when(col("xmx") === col("xmn"), lit(0L))
          .otherwise(expr(s"((xr - xmn) * $top) DIV (xmx - xmn)")).as("xb"),
        when(col("ymx") === col("ymn"), lit(0L))
          .otherwise(expr(s"((yr - ymn) * $top) DIV (ymx - ymn)")).as("yb"))
      .withColumn("bucket",
        shiftright(zValue(col("xb"), col("yb"), bits), 2 * bits - bucketBits))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("xr")).as("x_min"), max(col("xr")).as("x_max"),
        min(col("yr")).as("y_min"), max(col("yr")).as("y_max"))
  }

  /** Quantified data-skipping: how much of the table a central 2-D box
    * predicate (x and y each restricted to the middle fifth of their
    * range) can SKIP from per-bucket min/max stats, under the Z-order
    * layout versus a single-column x sort — the number that justifies
    * paying the ZORDER write. A bucket is skipped when its extent
    * rectangle misses the box on either dimension; under the x sort the
    * y extents are near-full-range so only x prunes, while Z buckets
    * have tight extents on BOTH dimensions. Everything is exact integer
    * arithmetic (scaling, box bounds, ppm rates), so the whole report is
    * bit-portable. One narrow pass + two bounded (2^bucketBits-row)
    * aggregates. */
  def skipRateReport(df: DataFrame, x: Column, y: Column, bits: Int,
      bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= bits, "bucketBits in [1, bits]")
    val top = (1L << bits) - 1
    val raw = df.select(x.cast("long").as("xr"), y.cast("long").as("yr"))
    val stats = raw.agg(min(col("xr")).as("xmn"), max(col("xr")).as("xmx"),
      min(col("yr")).as("ymn"), max(col("yr")).as("ymx"))
    val scaled = raw.crossJoin(broadcast(stats))
      .select(col("xr"), col("yr"),
        when(col("xmx") === col("xmn"), lit(0L))
          .otherwise(expr(s"((xr - xmn) * $top) DIV (xmx - xmn)")).as("xb"),
        when(col("ymx") === col("ymn"), lit(0L))
          .otherwise(expr(s"((yr - ymn) * $top) DIV (ymx - ymn)")).as("yb"))
    // Both layouts' bucket ids come out of ONE projection over the scan,
    // unpivoted row-wise via inline() — a union of two branches would
    // re-read (and re-scale) the source once per layout.
    val extents = scaled
      .select(col("xr"), col("yr"), inline(array(
        struct(lit("zorder").as("layout"),
          shiftright(zValue(col("xb"), col("yb"), bits),
            2 * bits - bucketBits).as("bucket")),
        struct(lit("xsort").as("layout"),
          shiftright(col("xb"), bits - bucketBits).as("bucket")))))
      .groupBy(col("layout"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("xr")).as("x_min"), max(col("xr")).as("x_max"),
        min(col("yr")).as("y_min"), max(col("yr")).as("y_max"))
    val box = stats.select(
      expr("xmn + (xmx - xmn) * 2 DIV 5").as("bx_lo"),
      expr("xmn + (xmx - xmn) * 3 DIV 5").as("bx_hi"),
      expr("ymn + (ymx - ymn) * 2 DIV 5").as("by_lo"),
      expr("ymn + (ymx - ymn) * 3 DIV 5").as("by_hi"))
    extents.crossJoin(broadcast(box))
      .withColumn("skipped",
        col("x_max") < col("bx_lo") || col("x_min") > col("bx_hi") ||
          col("y_max") < col("by_lo") || col("y_min") > col("by_hi"))
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("skipped"), 1L).otherwise(0L)).as("buckets_skipped"),
        sum(col("n_rows")).as("total_rows"),
        sum(when(col("skipped"), col("n_rows")).otherwise(0L)).as("rows_skipped"))
      .select(col("layout"), col("n_buckets"), col("buckets_skipped"),
        col("total_rows"), col("rows_skipped"),
        expr("1000000 * rows_skipped DIV total_rows").as("skip_ppm"))
      .orderBy(col("layout"))
  }

  /** Incremental maintenance of a PARTITIONED aggregate table via
    * dynamic partition overwrite — the daily-warehouse-merge pattern: an
    * initial build writes history partitions, each later merge
    * recomputes ONLY the touched partitions and `INSERT OVERWRITE`s
    * exactly those directories (`partitionOverwriteMode=dynamic`:
    * untouched partitions are left byte-identical on disk — LayoutSpec
    * asserts their files don't change). At 100 TB this is the
    * difference between an O(day) nightly merge and an O(history)
    * recompute; the observable contract — maintained table ==
    * full recompute — is exactly what the oracle checks.
    *
    * The overwrite mode rides the DataFrameWriter itself
    * (`option("partitionOverwriteMode", ...)` — the per-write override
    * the DataSource contract defines), NOT a session-conf flip: two
    * concurrent writes on one SparkSession can't race each other into
    * the wrong overwrite semantics, and the caller's session conf is
    * never touched. The initial build passes `dynamic = false` (STATIC
    * overwrite truncates the whole table, clearing stale partitions
    * from any previous run); merges pass `dynamic = true`. */
  def overwritePartitions(df: DataFrame, path: String, partCol: String,
      dynamic: Boolean = true): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", if (dynamic) "dynamic" else "static")
      .partitionBy(partCol).parquet(path)

  /** Small-file compaction plan: assign each inventory row (one file,
    * with its byte size) to an output bin of ~`targetBytes`, coalescing
    * CONSECUTIVE files in `sortCols` order — the bin-packing strategy of
    * table-format OPTIMIZE/rewriteDataFiles jobs (pack in layout order so
    * compaction preserves clustering; public Delta/Iceberg semantics).
    *
    * A streaming sink at 100 TB emits one file per partition per
    * micro-batch — millions of KB-scale files whose open/seek overhead
    * dominates scans long before data volume does. The plan is pure
    * metadata math: `bin = exclusive_prefix_sum(bytes) DIV targetBytes`,
    * i.e. a file joins the bin where its first byte lands, so every bin
    * except possibly the last spans ≥ targetBytes and each bin's total is
    * < targetBytes + max(file) — the standard next-fit bound.
    *
    * Scale shape: the inventory is O(#files) — metadata, orders of
    * magnitude smaller than the table — and the prefix sum is
    * [[OrderStats.withGlobalPrefixSum]]'s range-partitioned two-pass
    * construction, so even a billion-file inventory never funnels
    * through one reducer. `sortCols` must be a total order for the plan
    * to be deterministic. Returns the inventory plus a `bin` column. */
  def compactionPlan(inventory: DataFrame, sortCols: Seq[Column],
      bytes: Column, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    val cum = OrderStats.withGlobalPrefixSum(
      inventory, sortCols, bytes, "__cum")
    cum.withColumn("bin", Bridge.column(IntegralDivide(
        Bridge.expression(col("__cum") - bytes.cast("long")),
        Literal(targetBytes))))
      .drop("__cum")
  }
}
