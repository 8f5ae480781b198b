package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** ONLINE k-anonymity maintenance — the streaming counterpart of
  * `DataQuality.kAnonymity` (the batch release gate behind
  * `rel_k_anonymity`): per-micro-batch arrivals fold their
  * quasi-identifier class counts into an on-disk parquet table via the
  * [[PartitionedUpsert]] exactly-once protocol (class sizes are sums, so
  * add-merge maintains them EXACTLY — the maintained table equals the
  * batch gate over the stream prefix at every micro-batch boundary, the
  * same stream==batch law every aggregate here carries).
  *
  * Scale shape: state lives on disk partitioned by the first QI column —
  * executor memory holds nothing between batches, a batch touches only
  * the partitions its rows land in, and the audit read is one scan of a
  * bounded-QI-domain table (a few hundred rows however large the
  * corpus). The audit flags (`violates_k`, integer-ppm re-identification
  * ceiling) compute on READ, so k is a query-time parameter — re-auditing
  * at a stricter k never replays the stream.
  */
object PrivacyScreen {

  private def upsert(path: String, part: String, key: String) =
    new PartitionedUpsert(
      path, partCol = part, keyCols = Seq(key), sumCols = Seq("class_size"),
      aggregate = _.groupBy(col(part), col(key))
        .agg(count(lit(1)).as("class_size")))

  /** Apply one micro-batch of rows carrying the two QI columns. Exposed
    * for direct testing; [[maintainClassSizes]] wires it into
    * foreachBatch. */
  def applyBatch(batch: DataFrame, path: String, part: String, key: String,
      batchId: Long): Unit =
    upsert(path, part, key).applyBatch(batch, batchId)

  /** The streaming writer: raw rows in, maintained per-QI-class count
    * table on disk. Append mode — all state lives in the table. */
  def maintainClassSizes(rows: DataFrame, path: String, part: String,
      key: String): DataStreamWriter[Row] =
    upsert(path, part, key).writer(rows)

  /** Read-side audit of the maintained table: same columns as the batch
    * gate (`class_size`, strict `< k` flag, 1e6/size ceiling in ppm). */
  def audit(spark: SparkSession, path: String, k: Int): DataFrame =
    spark.read.parquet(path)
      .withColumn("violates_k", (col("class_size") < k).cast("int"))
      .withColumn("reident_ppm",
        expr("CAST(1000000 AS BIGINT) DIV class_size"))
}
