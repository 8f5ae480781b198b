package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media record (opaque bytes + typed metadata). */
case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String)

/** Features extracted by the (stubbed) decoder. `byte_sum` /
  * `n_distinct_bytes` are exact integers and `mean_byte` a fixed IEEE
  * division, so the oracle can replicate them bit-for-bit; `entropy` goes
  * through transcendental log whose last-bit rounding is libm-specific,
  * which is why the oracle-checked query rounds it to 6 decimals. */
case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
    byte_sum: Long, n_distinct_bytes: Int, mean_byte: Double,
    entropy: Double, n_frames: Int)

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video as opaque `binary` columns with typed metadata, decoded and
  * feature-extracted per partition.
  *
  * The Spark-side shape is real and tested — schema, partition-batched
  * iteration (`mapPartitions`, the JVM analog of a batched Pandas UDF:
  * per-partition setup cost amortized over the batch, streaming iterator,
  * no per-row codec init), deterministic output. The actual codec call is
  * a clearly-marked STUB (no image/audio libraries ship in this
  * container): it derives features from the raw bytes so tests are
  * deterministic. Swap [[decodeStub]] for a real codec binding to
  * productionize; nothing else changes.
  *
  * Scale notes: decode is embarrassingly parallel narrow work — the only
  * knobs that matter at 100 TB are input-split sizing (binary payloads →
  * lower `spark.sql.files.maxPartitionBytes`) and keeping codec init
  * per-partition, which mapPartitions guarantees.
  */
object Multimodal {

  /** Deterministic synthetic media table derived from `documents`: the
    * text's UTF-8 bytes play the payload, mime rotates by doc_id. Stands in
    * for `spark.read.format("binaryFile")` at the same schema. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("bytes"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"))

  /** STUB decoder ??? — stands in for the real codec (PIL/ffmpeg-class
    * work). Deterministic byte statistics so the plumbing is testable. */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val bytes = m.bytes
    val hist = new Array[Long](256)
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      hist(b) += 1
      sum += b
      i += 1
    }
    val n = bytes.length.max(1)
    var entropy = 0.0
    var nDistinct = 0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) {
        nDistinct += 1
        val p = hist(j).toDouble / n
        entropy -= p * math.log(p) / math.log(2)
      }
      j += 1
    }
    // "frame sampling": pretend 1 frame per 64 payload bytes
    MediaFeatures(m.doc_id, m.mime, bytes.length, sum, nDistinct,
      sum.toDouble / n, entropy, 1 + bytes.length / 64)
  }

  /** Partition-batched decode + feature extraction. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition: real codecs would init once here (the point of
      // mapPartitions over a per-row UDF)
      rows.map(decodeStub)
    }
  }

  /** Evenly-spaced n-byte "frame" offsets for a payload — the frame-sample
    * access pattern without a codec. */
  def frameOffsets(nBytes: Int, frameSize: Int, maxFrames: Int): Seq[Int] = {
    if (nBytes <= 0 || frameSize <= 0) Seq.empty
    else {
      val total = math.max(1, nBytes / frameSize)
      val take = math.min(total, maxFrames)
      (0 until take).map(i => (i.toLong * nBytes / take).toInt)
    }
  }

  /** Distributed frame sampling: one row per sampled frame of every
    * payload — [[frameOffsets]] as a declarative generate (narrow, no
    * shuffle; at 100 TB this is the "read k evenly-spaced frames per
    * video without decoding the rest" access pattern, and the payload
    * column itself is never widened, only its length is read).
    *
    * Offset arithmetic is floor(double) on exact-integer operands —
    * i·nb ≤ maxFrames·2³¹ is exactly representable and the quotient's
    * distance to any integer it isn't equal to is ≥ 1/take ≫ 1 ulp, so
    * this equals [[frameOffsets]]'s integer division (spec-asserted) AND
    * is bit-replicable in the oracle's FLOOR/CAST SQL. */
  def frameSample(media: DataFrame, frameSize: Int, maxFrames: Int): DataFrame = {
    require(frameSize > 0 && maxFrames > 0, "need positive frame geometry")
    val nb = octet_length(col("bytes")).cast("long")
    val take = least(
      greatest(lit(1.0), floor(nb / lit(frameSize.toDouble))),
      lit(maxFrames.toDouble))
    media
      .select(col("doc_id"), col("mime"), nb.as("n_bytes"),
        take.cast("int").as("n_frames"))
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("mime"), col("n_bytes"), col("n_frames"),
        posexplode(transform(
          sequence(lit(0L), col("n_frames").cast("long") - 1),
          i => floor((i * col("n_bytes")).cast("double") /
            col("n_frames").cast("double")).cast("int")))
          .as(Seq("frame_id", "frame_off")))
  }
}
