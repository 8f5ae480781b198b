package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Library-usage cache-lifecycle contract: a dedup operator invoked through
  * CacheScope.using must leave ZERO cached blocks behind after the loan
  * block returns, and the result computed inside the scope must equal the
  * unmanaged (session-lifetime cache) result. */
class CacheScopeSpec extends GraftSparkSpec {

  private lazy val docs = {
    val base = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val texts = Seq(
      0L -> base.mkString(" "),
      1L -> base.mkString(" "),
      2L -> (base.init :+ "CHANGED").mkString(" "),
      3L -> Seq("totally", "different", "set", "of", "words", "no", "overlap",
        "with", "anything", "above", "for", "sure").mkString(" "))
    spark.createDataFrame(texts.map { case (id, t) => (id, t, "src0") })
      .toDF("doc_id", "text", "source")
  }

  // The session is shared across suites (TestSpark.spark), and earlier suites
  // legitimately pin localCheckpoint RDDs that catalog.clearCache() does not
  // (and must not) drop. The contract under test is therefore a DELTA: no
  // persistent RDD *created inside the scope* may outlive it — not that the
  // whole session is cache-free.
  private def persistentIds(): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def leakedAfter(baseline: Set[Int]): Set[Int] =
    persistentIds() -- baseline

  test("CacheScope.using releases every operator cache after the loan block") {
    spark.catalog.clearCache()
    val baseline = persistentIds()
    val operators = Seq[(String, CacheScope => org.apache.spark.sql.DataFrame)](
      "jaccard" -> (s => Dedup.jaccardPairsExact(docs, 0.5, s)),
      "ppjoin" -> (s => Dedup.ppjoinPairs(docs, 0.5, s)),
      "containment" -> (s => Dedup.containmentPairs(docs, 0.9, s)),
      "minhash" -> (s => Dedup.minhashPairs(docs, 0.5, s)),
      "simhash" -> (s => Dedup.simhashPairs(docs, 3, portable = true, s)),
      "dedupCorpus" -> (s => Dedup.dedupCorpus(docs, 0.8, s)))
    operators.foreach { case (name, build) =>
      val n = CacheScope.using(build) { pairs =>
        val c = pairs.count() // materializes the operator's lazy cache()s
        assert(leakedAfter(baseline).nonEmpty,
          s"$name: expected live caches inside the scope")
        c
      }
      assert(n >= 0)
      // unpersist(blocking = false) is async; poll briefly for drain
      val deadline = System.nanoTime() + 10e9.toLong
      while (leakedAfter(baseline).nonEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(leakedAfter(baseline) === Set.empty[Int],
        s"$name: cached blocks outlived the CacheScope.using block")
    }
  }

  test("scoped result is identical to the unmanaged default") {
    val unmanaged = Dedup.ppjoinPairs(docs, 0.5)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val scoped = CacheScope.using(s => Dedup.ppjoinPairs(docs, 0.5, s)) {
      _.orderBy("doc_a", "doc_b").collect().toSeq
    }
    assert(scoped === unmanaged)
    spark.catalog.clearCache()
  }

  test("release is exception-safe: caches freed when the loan block throws") {
    spark.catalog.clearCache()
    val baseline = persistentIds()
    intercept[RuntimeException] {
      CacheScope.using(s => Dedup.minhashPairs(docs, 0.5, s)) { pairs =>
        pairs.count()
        throw new RuntimeException("boom")
      }
    }
    val deadline = System.nanoTime() + 10e9.toLong
    while (leakedAfter(baseline).nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(leakedAfter(baseline) === Set.empty[Int])
  }
}
