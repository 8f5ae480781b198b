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

  test("hash60 matches the documented DuckDB construction on a known value") {
    // md5("42") = a1d0c6e83f027327d8461063f4ac58a6 -> top 15 hex digits
    val got = rows.filter(col("id") === 42).select(Sampling.hash60(col("id")))
      .head().getLong(0)
    assert(got === java.lang.Long.parseLong("a1d0c6e83f02732", 16))
  }
}
