package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1-alternative — file-directory streaming source: the ingest pattern a
  * 100 TB pipeline actually runs when the transport is an object store
  * rather than Kafka (upstream lands parquet/JSON files in a landing
  * prefix; the stream tails the directory). Exactly-once comes from the
  * file-source log in the checkpoint (each file is processed once, across
  * restarts), mirroring what Kafka offsets give `kafkaSource`.
  *
  * Scale notes:
  *   - `maxFilesPerTrigger` is the backpressure knob: it bounds per-batch
  *     input so one giant landing burst cannot produce a batch that
  *     exceeds executor memory — the file analogue of Kafka's
  *     `maxOffsetsPerTrigger`.
  *   - The schema is REQUIRED, not inferred: inference would list+read
  *     the directory before every restart.
  *   - The directory listing itself is the scale bottleneck: the
  *     file-source log compacts every
  *     `spark.sql.streaming.fileSource.log.compactInterval` batches, and
  *     production rotates landing prefixes (e.g. daily) so neither the
  *     listing nor the log grows unboundedly.
  */
object FileIngest {

  def parquetDirStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
}
