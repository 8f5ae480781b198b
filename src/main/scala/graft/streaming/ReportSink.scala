package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.operators.Behavior

/** The engine's replacement for the reference's report sink (S8,
  * `Raport.py:101-213`): instead of matplotlib pies + a PDF guarded by a
  * psutil file-open scan (S9), each report tick materializes the
  * aggregated tables atomically as parquet under `outDir/batch=<id>/`.
  * Parquet directory writes are atomic-rename; re-run batches overwrite
  * idempotently — the S9 concurrency guard is unnecessary by construction.
  *
  * The per-batch work derives every report table (A1 value counts,
  * A3 clicks-per-service + F6 shares, A5 breakdown) from ONE cached
  * snapshot of the micro-batch — mirroring `save_plots_to_pdf`'s
  * derivations without re-reading history (T2 incremental). */
object ReportSink {

  /** Tables derived per report tick. */
  def reportTables(msgs: DataFrame): Map[String, DataFrame] = Map(
    "value_counts" -> Behavior.valueCounts(msgs),
    "clicks_by_service" -> Behavior.pctShare(msgs),
    "dim_breakdown" -> Behavior.dimBreakdown(msgs))

  /** Wire a streaming message frame to a 60 s cadence report writer. */
  def writer(msgs: DataFrame, outDir: String, checkpoint: String,
      cadence: String = "60 seconds"): DataStreamWriter[Row] =
    msgs.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(cadence))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeReport(batch, outDir, batchId)
      }

  /** One report tick: derive and write all tables for this batch. */
  def writeReport(msgs: DataFrame, outDir: String, batchId: Long): Unit = {
    msgs.persist()
    try {
      reportTables(msgs).foreach { case (name, df) =>
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId/$name")
      }
    } finally msgs.unpersist()
  }
}
