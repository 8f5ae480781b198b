package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact order statistics.
  *
  * A global `row_number() OVER (ORDER BY ...)` (or `ntile`, or
  * `sort_array(collect_list(...))`) forces every row through ONE reducer —
  * the classic scale-killer for exact quantiles. The scale-safe exact
  * construction is range-partitioned sort + per-partition offsets:
  *
  *  1. `repartitionByRange` on the sort key — a sampled, distributed
  *     exchange; partition i holds keys strictly below partition i+1's;
  *  2. each partition computes LOCAL `row_number` (P parallel sorts, each
  *     over ~1/P of the data);
  *  3. one tiny P-row frame of per-partition counts yields each
  *     partition's cumulative offset (the ONLY unpartitioned window in the
  *     plan runs over those P rows — bounded by the partition count, never
  *     the data), broadcast back;
  *  4. global rank = offset + local rank — exactly the single-reducer
  *     window's output, with no single reducer and no full-column buffer.
  *
  * Two full-data shuffles total (the range exchange, then the hash
  * exchange feeding the per-partition window); both key on narrow columns
  * and both scale out to any partition count.
  */
object OrderStats {

  /** Appends a global-rank column (`rankCol`, 1-based `long`, equal to
    * `row_number() OVER (ORDER BY sortCols)`) and a total-row-count column
    * (`totalCol`, `long`) to `df`, computed distributively as described in
    * the object doc. `sortCols` must be a total order (include a unique
    * tie-breaker) for the rank to be deterministic. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
      rankCol: String = "rn", totalCol: String = "n"): DataFrame = {
    val withPid = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val wCum = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = withPid.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col("__pid"),
        coalesce(sum(col("__cnt")).over(wCum), lit(0L)).as("__offset"),
        sum(col("__cnt")).over(wAll).as(totalCol))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    withPid.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol,
        row_number().over(wLocal).cast("long") + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Appends a global INCLUSIVE prefix sum of `value` over the total order
    * `sortCols` (`cumCol`, `long` — equal to `sum(value) OVER (ORDER BY
    * sortCols ROWS UNBOUNDED PRECEDING)`), via the same range-partitioned
    * two-pass construction as [[withGlobalRank]]: per-partition local
    * cumulative sums in parallel, plus a broadcast P-row frame of
    * partition offsets. The only unpartitioned window runs over those P
    * rows — bounded by the partition count, never the data. */
  def withGlobalPrefixSum(df: DataFrame, sortCols: Seq[Column], value: Column,
      cumCol: String = "cum"): DataFrame = {
    val withPid = df.repartitionByRange(sortCols: _*)
      .withColumn("__v", value.cast("long"))
      .withColumn("__pid", spark_partition_id())
    val wCum = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__psum"))
      .select(col("__pid"),
        coalesce(sum(col("__psum")).over(wCum), lit(0L)).as("__offset"))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    withPid.join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumCol, sum(col("__v")).over(wLocal) + col("__offset"))
      .drop("__pid", "__offset", "__v")
  }
}
