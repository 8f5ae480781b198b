package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

/** Whole-corpus CCNet bucketing (`txt_ccnet_full`): the driver's corpus has
  * no sub-2-token documents, so the sentinel path the query exists for is
  * exercised here with a fixture that HAS unscoreable docs — CCNet keeps
  * everything it buckets, and a bigram LM simply cannot score a 1-token
  * document, so those must surface in sentinel bucket -1 (NULL score
  * bounds) rather than silently vanish from the corpus accounting. */
class CcnetFullSpec extends GraftSparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-ccnetfull-").toString
    // 6 scoreable docs (≥2 tokens) → terciles of 2/2/2; 2 unscoreable
    // (1 token / empty-ish) → sentinel bucket. All doc_ids EVEN: the
    // LM-family queries run on the registered 1-in-2 `doc_id % 2 = 0`
    // sample (bench diet, oracle-mirrored), so the fixture places every
    // doc inside the sample to keep exercising the full sentinel logic.
    val rows = Seq(
      (0L, "the cat sat", "en", "web", 11L),
      (2L, "the cat ran", "en", "web", 11L),
      (4L, "a dog sat", "en", "web", 9L),
      (6L, "a dog ran far", "en", "web", 13L),
      (8L, "the dog sat", "en", "web", 11L),
      (10L, "a cat ran", "en", "web", 9L),
      (12L, "singleton", "en", "web", 9L),
      (14L, "x", "en", "web", 1L))
    spark.createDataFrame(rows)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("unscoreable docs land in sentinel bucket -1 with NULL bounds") {
    val out = SparkEntry.queries("txt_ccnet_full")(spark, dir).collect()
    val byBucket = out.map(r => r.getLong(0) -> r).toMap
    assert(byBucket.keySet === Set(-1L, 0L, 1L, 2L))
    val sentinel = byBucket(-1L)
    assert(sentinel.getLong(1) === 2L) // doc 12 and doc 14
    assert(sentinel.isNullAt(2) && sentinel.isNullAt(3))
    // every document is accounted for: buckets partition the corpus
    assert(out.map(_.getLong(1)).sum === 8L)
    // scoreable terciles are 2/2/2 and carry real score bounds
    Seq(0L, 1L, 2L).foreach { b =>
      assert(byBucket(b).getLong(1) === 2L, s"bucket $b")
      assert(!byBucket(b).isNullAt(2) && !byBucket(b).isNullAt(3), s"bucket $b")
    }
  }

  test("on an all-scoreable corpus the sentinel bucket is absent") {
    val d2 = Files.createTempDirectory("graft-ccnetfull2-").toString
    spark.createDataFrame(Seq(
      (0L, "the cat sat", "en", "web", 11L),
      (2L, "the cat ran", "en", "web", 11L),
      (4L, "a dog sat", "en", "web", 9L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val out = SparkEntry.queries("txt_ccnet_full")(spark, d2).collect()
    assert(out.map(_.getLong(0)).toSet === Set(0L, 1L, 2L))
    assert(out.map(_.getLong(1)).sum === 3L)
  }
}
