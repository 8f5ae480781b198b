package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Deterministic sampling: content-keyed membership is reproducible,
  * partition-independent, and hits the requested rate on average. */
class SamplingSpec extends GraftSparkSpec {

  private lazy val rows = spark.range(0, 10000).toDF("id")
    .withColumn("stratum", (col("id") % 3).cast("string"))

  test("hash sample: deterministic, repartition-invariant, near target rate") {
    val a = Sampling.hashSample(rows, col("id"), 100).collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSample(rows.repartition(13), col("id"), 100)
      .collect().map(_.getLong(0)).sorted
    assert(a === b)
    assert(a.length > 800 && a.length < 1200) // 10% of 10k, generous CI
  }

  test("rates 0 and 1000 are empty and complete") {
    assert(Sampling.hashSample(rows, col("id"), 0).count() === 0)
    assert(Sampling.hashSample(rows, col("id"), 1000).count() === 10000)
  }

  test("stratified sample: per-stratum rates honored, unknown strata dropped") {
    val got = Sampling.stratifiedSample(rows, col("stratum"), col("id"),
      Map("0" -> 1000, "1" -> 100))
    val byStratum = got.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("0") === 3334) // every id % 3 == 0
    assert(byStratum("1") > 200 && byStratum("1") < 500) // ~10% of 3333
    assert(!byStratum.contains("2"))
  }

  test("hashTopK: exact size, deterministic membership, plan is TakeOrdered") {
    val k1 = Sampling.hashTopK(rows, col("id"), 50).collect().map(_.getLong(0)).toSet
    val k2 = Sampling.hashTopK(rows.repartition(7), col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    assert(k1.size === 50 && k1 === k2)
    val plan = Sampling.hashTopK(rows, col("id"), 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("weighted repeat: multiplicity is (stratum weight, key hash)-determined") {
    val s = spark
    import s.implicits._
    val df = (0L until 300L).map(i =>
      (i, if (i % 3 == 0) "up" else if (i % 3 == 1) "keep" else "down"))
      .toDF("doc_id", "stratum")
    val out = Sampling.weightedRepeat(df, col("stratum"), col("doc_id"),
      Map("up" -> 2500, "keep" -> 1000, "down" -> 400, "absent" -> 0))
      .groupBy(col("doc_id"), col("stratum"))
      .agg(count(lit(1)).as("n"), max(col("copy_id")).as("max_copy"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getInt(3))))
      .toMap
    // copy_id is a dense 1..n per key; multiplicity matches the hash rule
    out.foreach { case (id, (st, n, maxCopy)) =>
      assert(n === maxCopy.toLong, s"copy_id not dense for $id")
      val frac = st match { case "up" => 500; case "keep" => 0; case _ => 400 }
      val whole = st match { case "up" => 2; case "keep" => 1; case _ => 0 }
      val h = rows.filter(col("id") === id)
        .select(Sampling.hash60(col("id")) % 1000).head().getLong(0)
      assert(n === whole + (if (h < frac) 1 else 0), s"wrong multiplicity for $id ($st)")
    }
    // every keep-stratum row appears exactly once; dropped strata absent
    val keeps = out.filter(_._2._1 == "keep")
    assert(keeps.size === 100 && keeps.values.forall(_._2 == 1L))
    // expected-rate sanity on the fractional strata
    val upRows = out.filter(_._2._1 == "up").values.map(_._2).sum
    assert(upRows >= 200 && upRows <= 300, s"2.5-epoch stratum emitted $upRows rows")
  }

  test("hash60 matches the documented DuckDB construction on a known value") {
    // md5("42") = a1d0c6e83f027327d8461063f4ac58a6 -> top 15 hex digits
    val got = rows.filter(col("id") === 42).select(Sampling.hash60(col("id")))
      .head().getLong(0)
    assert(got === java.lang.Long.parseLong("a1d0c6e83f02732", 16))
  }

  test("repeatByRate matches weightedRepeat on identical rates; unrated strata drop") {
    val data = spark.createDataFrame(
      (1L to 300L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    ).toDF("id", "stratum")
    val rates = Map("a" -> 1500, "b" -> 400) // c unrated -> dropped
    val viaMap = Sampling.weightedRepeat(data, col("stratum"), col("id"), rates)
      .select(col("id"), col("copy_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    val ratesDf = spark.createDataFrame(rates.toSeq).toDF("stratum", "permille")
    val viaFrame = Sampling.repeatByRate(data, col("stratum"), col("id"), ratesDf)
      .select(col("id"), col("copy_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(viaMap.toSeq === viaFrame.toSeq)
    assert(viaFrame.forall { case (id, _) => id % 3 != 2 }) // stratum c absent
  }

  test("shuffle shards: exact permutation, fixed-size shards, seed-dependent") {
    val a = Sampling.shuffleShards(rows, col("id"), 7, 100)
      .select(col("id"), col("shuffle_rank"), col("shard")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ranks are a permutation of 1..n; shards are (rank-1) DIV 100
    assert(a.map(_._2).sorted.toSeq === (1L to rows.count()).toSeq)
    a.foreach { case (_, rk, sh) => assert(sh === (rk - 1) / 100) }
    // partition-independence: repartitioned input gives the identical map
    val b = Sampling.shuffleShards(rows.repartition(13), col("id"), 7, 100)
      .select(col("id"), col("shuffle_rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.map(t => t._1 -> t._2).toMap === b)
    // a different seed is a different permutation (not a shifted copy)
    val c = Sampling.shuffleShards(rows, col("id"), 8, 100)
      .select(col("id"), col("shuffle_rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.exists { case (id, rk, _) => c(id) != rk })
  }

  test("XOR content fingerprint: partition-invariant, change- and id-sensitive") {
    def fp(df: org.apache.spark.sql.DataFrame): Long = df
      .withColumn("h", Sampling.hash60(
        concat(col("id").cast("string"), lit(":"), md5(col("text")))))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    val docs = rows.limit(500)
      .select(col("id"), concat(lit("doc "), col("id")).as("text"))
    val base = fp(docs)
    // order/partitioning never moves an XOR fold
    assert(fp(docs.repartition(17)) === base)
    assert(fp(docs.orderBy(col("id").desc)) === base)
    // one changed byte in one row changes the checksum
    val mutated = docs.withColumn("text",
      when(col("id") === 123, lit("doc 123!")).otherwise(col("text")))
    assert(fp(mutated) !== base)
    // same content under a different doc id also changes it (the id is
    // part of the hashed record, so a re-keyed copy is a different dataset)
    val rekeyed = docs.withColumn("id",
      when(col("id") === 123, lit(9999L)).otherwise(col("id")))
    assert(fp(rekeyed) !== base)
  }
}
