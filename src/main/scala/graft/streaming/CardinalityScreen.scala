package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** ONLINE distinct-count maintenance — the streaming form of
  * `rel_hll_reaggregate`'s merge law: each micro-batch reduces to one
  * DataSketches HLL sketch per (day, event_type) and folds it into the
  * on-disk table via [[PartitionedUpsert]]'s `hll_union_agg` merge.
  *
  * This is the DAU/MAU dashboard pattern at 100 TB: distinct-user state
  * lives ON DISK as mergeable sketches (KBs per key, readable by any
  * engine mid-stream), NOT as exact user sets in the streaming state
  * store — a day with 10⁹ distinct users costs the same bytes as a day
  * with 10³. Roll-ups come free: union the daily sketches to weekly /
  * monthly cardinalities without touching raw history (the
  * re-aggregation law `rel_hll_reaggregate` pins in batch). Estimates
  * compute on READ via `hll_sketch_estimate`. */
object CardinalityScreen {

  /** Per-(day, event_type) sketch + row count of one batch of
    * (day STRING, event_type STRING, user_id LONG) rows. */
  private[streaming] def sketchOf(batch: DataFrame): DataFrame =
    batch.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        hll_sketch_agg(col("user_id")).as("users_sk"))

  private def upsert(path: String) = new PartitionedUpsert(
    path, partCol = "day", keyCols = Seq("event_type"),
    sumCols = Seq("n_events"),
    aggregate = sketchOf,
    sketchCols = Seq("users_sk"))

  /** Apply one micro-batch. Exposed for direct testing;
    * [[maintainDistincts]] wires it into foreachBatch. */
  def applyBatch(batch: DataFrame, path: String, batchId: Long): Unit =
    upsert(path).applyBatch(batch, batchId)

  /** The streaming writer: raw event rows in, maintained per-day sketch
    * table on disk. Append mode — all state lives in the table. */
  def maintainDistincts(rows: DataFrame, path: String): DataStreamWriter[Row] =
    upsert(path).writer(rows)

  /** Read-side estimates: per-(day, event_type) distinct users, plus the
    * free roll-up — per-day users unioned across event types. */
  def estimates(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("day").cast("string").as("day"), col("event_type"),
        col("n_events"),
        hll_sketch_estimate(col("users_sk")).as("est_users"))

  def dailyRollup(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("day").cast("string").as("day"))
      .agg(sum(col("n_events")).as("n_events"),
        hll_sketch_estimate(hll_union_agg(col("users_sk"))).as("est_users"))
}
