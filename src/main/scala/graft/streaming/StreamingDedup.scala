package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.operators.{Dedup, Similarity}

/** Incremental near-dup detection: a document STREAM checked against a
  * STATIC historical MinHash index — the production shape for corpus
  * ingestion (the 100 TB history is indexed once; each arriving batch
  * pays only its own signature cost + a band-key equi-join).
  *
  * Stream side work is all narrow (shingle → signature → band explode);
  * the stream-static band join is stateless (Append-mode safe). Matches
  * are exact-verified with jaccard against the historical shingle sets,
  * so precision is exact; recall carries the banding guarantee
  * (SURVEY-documented ≥ 1−2e-14 at j ≥ 0.89).
  */
object StreamingDedup {

  /** Precompute the historical index: band table + shingle sets.
    * In production both persist as bucketed tables keyed by (band, bsig)
    * and doc_id respectively. */
  def buildIndex(historical: DataFrame): (DataFrame, DataFrame) = {
    val sh = Dedup.shingleSets(historical)
    val bands = Dedup.bandTable(Dedup.minhashSignature(sh))
    (bands, sh)
  }

  /** Persist the band index as a BUCKETED parquet table — the on-disk
    * form of the historical corpus index the scaladoc above promises.
    * Bucketing by the join keys (band, bsig), sorted within buckets, is
    * the layout that lets every later ingest batch sort-merge against
    * the index WITHOUT shuffling the historical side: the table's
    * bucketing IS its output partitioning, so only the (small) arriving
    * batch exchanges. At 100 TB the index is written once per
    * re-index cadence and `nBuckets` is sized to executor count; the
    * incremental path never rewrites or reshuffles it. (`bucketBy`
    * requires `saveAsTable` — bucket metadata lives in the session
    * catalog; a warehouse deployment would use a shared metastore.) */
  def persistIndex(bands: DataFrame, table: String, path: String,
      nBuckets: Int = 8): Unit =
    bands.write.format("parquet")
      .bucketBy(nBuckets, "band", "bsig")
      .sortBy("band", "bsig")
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Read a [[persistIndex]] table back, bucketing metadata intact. */
  def reloadIndex(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Write + read-back in one step (the e2e roundtrip the
    * dd_index_persist query drives). */
  def persistAndReload(bands: DataFrame, table: String, path: String,
      nBuckets: Int = 8): DataFrame = {
    persistIndex(bands, table, path, nBuckets)
    reloadIndex(bands.sparkSession, table)
  }

  /** One batch of new docs against the index → (doc_id, dup_of, jaccard)
    * for every historical near-duplicate above the threshold. */
  def dedupBatch(newDocs: DataFrame, indexBands: DataFrame,
      indexShingles: DataFrame, threshold: Double): DataFrame = {
    val sh = Dedup.shingleSets(newDocs)
    val newBands = Dedup.bandTable(Dedup.minhashSignature(sh))
    val cand = newBands.as("n")
      .join(indexBands.as("h"),
        col("n.band") === col("h.band") && col("n.bsig") === col("h.bsig"))
      .select(col("n.doc_id").as("doc_id"), col("h.doc_id").as("dup_of"))
      .filter(col("doc_id") =!= col("dup_of"))
      .distinct()
    cand
      .join(sh.select(col("doc_id"), col("sh").as("sh_new")), Seq("doc_id"))
      .join(indexShingles.select(col("doc_id").as("dup_of"), col("sh").as("sh_old")),
        Seq("dup_of"))
      .select(col("doc_id"), col("dup_of"),
        Dedup.jaccard(col("sh_new"), col("sh_old")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-modality historical index: every vector with its sign-LSH
    * bucket id. In production this persists as a table bucketed by
    * `bucket` — the stream side then joins without shuffling history. */
  def buildVectorIndex(historical: DataFrame, nBits: Int = 8,
      dim: Int = 64): DataFrame =
    historical.select(col("vec_id"), col("embedding"),
      Similarity.lshBucket(col("embedding"), nBits, dim).as("bucket"))

  /** Semantic (embedding) incremental dedup — the [[dedupBatch]] analog
    * on the vector modality, expressed as a PURE stream transform: all
    * stream-side work is narrow (bucket bits + hamming-1 multi-probe
    * explode), the bucket equi-join against the static index is
    * stateless (Append-safe), and candidates are exact-cosine verified.
    * Works identically on a batch frame (stream==batch law). Returns
    * (vec_id, dup_of, cosine) per flagged historical near-dup. */
  def dedupVectorStream(newVecs: DataFrame, index: DataFrame,
      threshold: Double, nBits: Int = 8, dim: Int = 64): DataFrame = {
    val probe = newVecs
      .select(col("vec_id"), col("embedding"),
        Similarity.lshBucket(col("embedding"), nBits, dim).as("bucket0"))
      .select(col("vec_id"), col("embedding"),
        explode(array(col("bucket0") +:
          (0 until nBits).map(b => col("bucket0").bitwiseXOR(lit(1L << b))): _*))
          .as("bucket"))
    probe
      .join(index.select(col("vec_id").as("dup_of"),
        col("embedding").as("hv"), col("bucket")), Seq("bucket"))
      .filter(col("vec_id") =!= col("dup_of"))
      .select(col("vec_id"), col("dup_of"),
        Similarity.cosineSeq(col("embedding"), col("hv")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Ingest-time benchmark-contamination screen: each arriving micro-batch
    * of documents is scored against a STATIC benchmark n-gram index
    * ([[graft.operators.TextOps.gramIndex]], built once per eval-set
    * release) and per-doc overlap reports written via foreachBatch. The
    * per-doc aggregate is batch-local state (a document's grams arrive
    * together), so no streaming state store is needed; the broadcast
    * gram-hash join is the only wide edge and it never shuffles the
    * stream. */
  def contaminationWriter(docStream: DataFrame, benchGrams: DataFrame,
      n: Int, flagFrac: Double, outDir: String,
      checkpoint: String): DataStreamWriter[Row] =
    docStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.TextOps
          .contaminationReportIndexed(batch, benchGrams, n, flagFrac)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }

  /** Ingest-time Bloom screen: the 8 KiB history bitset
    * ([[graft.operators.Dedup.bloomBitset]], built ONCE before the
    * stream starts — the broadcast-filter deployment shape) probes every
    * arriving micro-batch with the pure narrow transform
    * [[graft.operators.Dedup.bloomProbe]]. No stream-side join, no
    * state store, Append-safe; per-doc aggregation is batch-local (a
    * doc's chunks arrive together). Stream==batch equality is asserted
    * in StreamingDedupSpec — the transform is literally the same
    * function. */
  def bloomWriter(docStream: DataFrame, bitset: Array[Long],
      chunkSize: Int, outDir: String,
      checkpoint: String): DataStreamWriter[Row] =
    docStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Dedup.bloomProbe(batch, bitset, chunkSize)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }

  /** Streaming wiring: each micro-batch of documents is checked against
    * the index and the flagged pairs written via foreachBatch. */
  def writer(docStream: DataFrame, indexBands: DataFrame,
      indexShingles: DataFrame, threshold: Double, outDir: String,
      checkpoint: String): DataStreamWriter[Row] =
    docStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupBatch(batch, indexBands, indexShingles, threshold)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
}
