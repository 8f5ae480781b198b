package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scratch diagnosis main (not part of the driver contract): decompose
  * the sf1 LSH near-dup pair blowup (SCALING.md "Generator artifacts",
  * 121 → 14,814 pairs at 10×) into same-replica vs cross-replica pairs
  * and characterize the cross-replica survivors.
  */
object Probe {
  private val OFF = 931170240L

  /** Args: the data dirs to probe (each must contain embeddings.parquet),
    * defaulting to the two dirs the r15 diagnosis compared; `cpus=N`
    * anywhere in the args overrides local[32] — same convention as
    * Profile, so the tool runs on any machine instead of hardcoding this
    * host's layout. */
  def main(args: Array[String]): Unit = {
    val cpus = args.collectFirst { case a if a.startsWith("cpus=") =>
      a.stripPrefix("cpus=") }.getOrElse("32")
    val dirs = args.filterNot(_.startsWith("cpus=")) match {
      case Array() => Seq("/root/testdata/sf0.1", "/tmp/sf1")
      case ds => ds.toSeq
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val thr = Similarity.calibratedDupThreshold(n)
      println(s"[probe] $dir n=$n calibrated_threshold=$thr")
      val pairs = Similarity.embeddingDupPairsLsh(emb, thr)
        .withColumn("ra", floor(col("vec_a") / OFF).cast("long"))
        .withColumn("rb", floor(col("vec_b") / OFF).cast("long"))
        .withColumn("cross", (col("ra") =!= col("rb")).cast("int"))
      val agg = pairs.groupBy(col("cross"))
        .agg(count(lit(1)).as("n"), avg(col("cosine")).as("mean_cos"),
          max(col("cosine")).as("max_cos"))
        .orderBy(col("cross")).collect()
      println(s"[probe] $dir pairs by cross-replica:")
      agg.foreach(r => println(s"[probe]   cross=${r.get(0)} n=${r.get(1)} mean=${r.get(2)} max=${r.get(3)}"))
      if (dir.contains("sf1")) {
        // what do cross-replica qualifying vectors look like?
        val sample = pairs.filter(col("cross") === 1)
          .orderBy(col("cosine").desc).limit(5)
          .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), Seq("vec_a"))
          .collect()
        sample.foreach { r =>
          val ea = r.getAs[scala.collection.Seq[Float]]("ea")
          println(s"[probe]   x-pair a=${r.getAs[Long]("vec_a")} b=${r.getAs[Long]("vec_b")} cos=${r.getAs[Double]("cosine")} ea-head=${ea.take(8).mkString(",")} distinctVals=${ea.distinct.size}")
        }
        // distribution: how many pairs involve a low-entropy (constantish) vector
        val lowEnt = emb.select(col("vec_id"),
          size(array_distinct(col("embedding"))).as("nv"))
        val tagged = pairs.filter(col("cross") === 1)
          .join(lowEnt.select(col("vec_id").as("vec_a"), col("nv").as("nva")), Seq("vec_a"))
          .join(lowEnt.select(col("vec_id").as("vec_b"), col("nv").as("nvb")), Seq("vec_b"))
        tagged.groupBy((col("nva") <= 4).as("a_low"), (col("nvb") <= 4).as("b_low"))
          .count().orderBy(col("a_low"), col("b_low"))
          .collect().foreach(r => println(s"[probe]   lowent a=${r.get(0)} b=${r.get(1)} n=${r.get(2)}"))
      }
    }
    spark.stop()
  }
}
