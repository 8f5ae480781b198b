package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column family: binary payload + typed metadata plumbing.
  * mm_binary_meta is oracle-checked (pure byte arithmetic); the stubbed
  * decode features are rows-only (the stub is engine-side by design). */
object MultimodalQueries extends QueryFamily {

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "mm_binary_meta" -> ((s, d) =>
      Multimodal.syntheticMedia(Tables.documents(s, d))
        .select(col("doc_id"), col("mime"),
          octet_length(col("bytes")).as("n_bytes"))
        .orderBy(col("doc_id"))),

    "mm_mime_stats" -> ((s, d) =>
      Multimodal.syntheticMedia(Tables.documents(s, d))
        .groupBy(col("mime"))
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("bytes")).cast("long")).as("total_bytes"))
        .orderBy(col("mime"))),

    "mm_features_stub" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticMedia(Tables.documents(s, d)))
        .toDF()
        .orderBy(col("doc_id"))),
  )

  private val mimeSql =
    "(['image/png','audio/wav','video/mp4'])[CAST(doc_id % 3 + 1 AS INT)]"

  val oracles: ListMap[String, String] = ListMap(
    "mm_binary_meta" ->
      s"""SELECT doc_id, $mimeSql AS mime, octet_length(encode(text)) AS n_bytes FROM documents ORDER BY doc_id""",
    "mm_mime_stats" ->
      s"""SELECT mime, COUNT(*) AS n_docs, CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes FROM (SELECT $mimeSql AS mime, text FROM documents) t GROUP BY mime ORDER BY mime""",
    // mm_features_stub: rows-only — decode stub is engine-side by design
  )
}
