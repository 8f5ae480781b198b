package graft.operators

import org.apache.spark.sql.{Column, DataFrame, DataFrameWriter, Row}
import org.apache.spark.sql.functions._

/** Join utilities for the 100 TB shapes Catalyst doesn't fully automate.
  *
  * - AQE already handles moderate skew (`skewJoin`) and broadcast
  *   selection; these utilities cover the two remaining production levers:
  *   pre-bucketed co-located joins (no shuffle at read time) and explicit
  *   salting for pathological hot keys that exceed AQE's split factor.
  */
object Joins {

  /** Write a table bucketed+sorted by the join key. Subsequent joins
    * between tables bucketed the same way plan WITHOUT an Exchange on
    * either side — the shuffle is paid once at layout time, amortized over
    * every later join/aggregation on that key (the 100 TB fact-table
    * pattern). Requires `saveAsTable` (bucket metadata lives in the
    * catalog). */
  def bucketWriter(df: DataFrame, key: String, buckets: Int): DataFrameWriter[Row] =
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)

  /** Salted equi-join for a skewed build side: explode the small side into
    * `salt` replicas, scatter the big side's hot keys uniformly with a
    * random-free deterministic salt (hash of a high-cardinality column),
    * join on (key, salt). Exact same rows as the plain join; the hot key's
    * work spreads over `salt` reducers instead of one straggler.
    *
    * big is salted with pmod(hash(saltBy), salt); small is replicated
    * `salt` times. Use when one key holds >> 1/partitions of the data and
    * AQE's skew split (which only splits the PROBE side reading) is not
    * enough.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      saltBy: Column): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltBy), lit(salt)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Exact integer division of a long column (Column `/` divides in
    * DOUBLE, whose 2^53 mantissa corrupts ns-scale epoch values). */
  private def idiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    Bridge.column(IntegralDivide(Bridge.expression(c.cast("long")), Literal(w)))
  }

  private def idiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a.cast("long")),
      Bridge.expression(b.cast("long"))))
  }

  /** Key-skew advisor: per candidate join/shuffle key value, how much of
    * the table it owns and the salt factor needed to spread it evenly.
    *
    * The planning question behind [[saltedJoin]]: BEFORE a 100 TB join
    * wedges on one straggler reducer, scan the fact table once (a plain
    * partial-aggregated groupBy — map-side combine makes this cheap even
    * on a hot key) and flag every key whose row count exceeds its fair
    * 1/`nPartitions` share. `salt_factor = ceil(n · nPartitions / total)`
    * is the number of sub-keys that brings the hot key back to ~one
    * partition's fair share — the `salt` argument to feed [[saltedJoin]],
    * or the signal to broadcast instead when the flagged key set is the
    * whole (low-cardinality) column.
    *
    * All integer arithmetic (exact in any engine): `share_ppm` is
    * parts-per-million via [[idiv]], never a double ratio. Returns ONLY
    * flagged keys (`salt_factor > 1`) — on a healthy key distribution the
    * advisor is empty, which is the common case a pipeline asserts on.
    * The `total` side is a 1-row aggregate cross-joined back (broadcast
    * by size); the grouped side shuffles once on the key — no collect. */
  def skewAdvisor(df: DataFrame, key: Column, keyName: String,
      nPartitions: Int): DataFrame = {
    require(nPartitions > 0, "nPartitions must be positive")
    val counts = df.groupBy(key.cast("string").as("key_value"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm", idiv(col("n") * lit(1000000L), col("__total")))
      .withColumn("salt_factor",
        idiv(col("n") * lit(nPartitions.toLong) + col("__total") - 1,
          col("__total")))
      .where(col("salt_factor") > 1)
      .select(lit(keyName).as("key_col"), col("key_value"), col("n"),
        col("share_ppm"), col("salt_factor"))
  }

  /** Range (interval) join via bin bucketing: `points` rows matched to
    * `intervals` rows (columns `lo`, `hi`) where point ∈ [lo, hi).
    * Intervals may overlap — a point matches every interval containing it.
    *
    * Catalyst plans a raw inequality join as BroadcastNestedLoopJoin —
    * O(|points| · |intervals|) comparisons, a non-starter at 100 TB.
    * Bucketing turns it into an equi-join: a point lands in bin
    * `point DIV binWidth`; each interval is replicated to every bin it
    * overlaps ((hi-lo)/binWidth + 1 rows, O(1) when binWidth is near the
    * interval width); the bin equi-join plus the residual [lo, hi) filter
    * is exact. The replicated interval side is broadcast here (dimension
    * tables of time windows / ID ranges are small); for a large interval
    * table drop the broadcast hint and both sides shuffle on `__bin`.
    *
    * Precondition: non-negative point/lo/hi domain (integral DIV truncates
    * toward zero, which is floor only for non-negatives; shift first). */
  def rangeJoinBinned(points: DataFrame, point: Column,
      intervals: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals.withColumn("__bin",
      explode(sequence(idiv(col("lo"), binWidth), idiv(col("hi") - 1, binWidth))))
    points.withColumn("__bin", idiv(point, binWidth))
      .join(broadcast(binned), Seq("__bin"))
      .where(point >= col("lo") && point < col("hi"))
      .drop("__bin")
  }
}
