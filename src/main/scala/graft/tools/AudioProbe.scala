package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the audio-family scaling investigation (SCALING.md
  * §audio): partition counts and per-stage wall for the encode→decode
  * pipeline, to separate scan granularity from per-row serialization. */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Multimodal
    val docs = graft.Tables.documents(spark, dir)
    println(s"docs scan partitions: ${docs.rdd.getNumPartitions}")
    val wavs = Multimodal.encodeAudio(docs)
    println(s"wavs partitions: ${wavs.rdd.getNumPartitions}")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    // warmup
    Multimodal.decodeAudioStats(wavs).toDF().count()
    time("encode only")(wavs.count())
    time("encode+decode")(Multimodal.decodeAudioStats(wavs).toDF().count())
    time("scan+deser only")(
      docs.selectExpr("doc_id", "cast(text as binary) as bytes")
        .where("octet_length(cast(text as binary)) > 0").count())
    import spark.implicits._
    time("decode: open only")(wavs.mapPartitions { rows =>
      rows.map { r =>
        val ais = Multimodal.probeOpenWav(r.wav)
        ais.getFormat.getSampleRate.toLong
      }
    }.count())
    time("decode: open+readAllBytes")(wavs.mapPartitions { rows =>
      rows.map { r =>
        val ais = Multimodal.probeOpenWav(r.wav)
        ais.readAllBytes().length.toLong
      }
    }.count())
    time("raw bytes sum (no javax.sound)")(wavs.mapPartitions { rows =>
      rows.map { r => var s = 0L; var i = 0
        while (i < r.wav.length) { s += (r.wav(i) & 0xFF); i += 1 }; s }
    }.count())
    spark.stop()
  }
}
