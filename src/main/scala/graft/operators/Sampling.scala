package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for dataset curation.
  *
  * `df.sample()` / `sampleBy()` draw from a seeded RNG whose stream
  * depends on partitioning — results change under repartition/AQE and
  * can't be reproduced by another engine. Curation pipelines want
  * CONTENT-KEYED sampling instead: a row's membership is a pure function
  * of its key, so samples are stable across runs, engines, cluster sizes,
  * and incremental re-ingests (a re-processed shard selects the same
  * rows). The price is that correlated keys sample together — the hash
  * decorrelates them.
  *
  * Membership hash: top-60-bits-of-md5 of the key string — the same
  * portable construction as [[graft.functions.SimHashKernel]]'s portable
  * mode (`('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB). Uniform over
  * [0, 2^60); per-mille buckets via mod 1000.
  */
object Sampling {

  /** Portable 60-bit md5 hash of a key column (non-negative). */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("bigint")

  /** SQL mirror of [[hash60]] for DuckDB. */
  def hash60Sql(expr: String): String =
    s"('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 15))::BIGINT"

  /** Keep ~`permille`/1000 of rows, keyed by `key`. */
  def hashSample(df: DataFrame, key: Column, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    df.filter(hash60(key) % 1000 < permille)
  }

  /** Stratified deterministic sample: per-stratum keep rates in permille.
    * Strata not in `rates` are dropped (mirrors `sampleBy`). The rate
    * lookup compiles to a when-chain — no join, no shuffle; the filter
    * sits directly on the scan. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Int]): DataFrame = {
    require(rates.nonEmpty, "need at least one stratum rate")
    val rate = rates.foldLeft(lit(-1)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(hash60(key) % 1000 < rate)
  }

  /** Deterministic corpus mixing by per-stratum epoch weights (permille):
    * each row is emitted `weight/1000` whole copies plus one more iff its
    * key hash falls under the fractional remainder — weight 1500 = 1.5
    * epochs, 250 = keep a quarter, 0 = drop the stratum. The
    * training-mix primitive (upsample rare or high-quality slices,
    * downsample over-represented ones) with the same engine-portable,
    * partition-independent guarantee as [[hashSample]]: membership AND
    * multiplicity are pure functions of (stratum, key). Emits a 1-based
    * `copy_id` per replica. Narrow per-row generate — no shuffle; output
    * rows ≈ Σ n_s · w_s / 1000. */
  def weightedRepeat(df: DataFrame, stratum: Column, key: Column,
      weightsPermille: Map[String, Int]): DataFrame = {
    require(weightsPermille.nonEmpty && weightsPermille.values.forall(_ >= 0),
      "need non-negative per-stratum permille weights")
    val copies = weightsPermille.foldLeft(lit(0)) { case (acc, (s, w)) =>
      when(stratum === s,
        lit(w / 1000) + when(hash60(key) % 1000 < w % 1000, 1).otherwise(0))
        .otherwise(acc)
    }
    // sequence(1, 0) would DESCEND ([1, 0]), not produce empty — gate it
    df.withColumn("copy_id",
      explode(when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** [[weightedRepeat]] with DATA-DRIVEN rates: the per-stratum permille
    * weights arrive as a (stratum, permille) dimension frame COMPUTED
    * upstream — the budget-constrained mix ("hit N tokens per language")
    * where each rate is budget/available rather than hand-configured.
    * Same determinism contract: multiplicity is a pure function of
    * (stratum, key); strata absent from `rates` are dropped. The rates
    * frame is dimension-sized → broadcast hash join, no shuffle of the
    * corpus; the generate is narrow. */
  def repeatByRate(df: DataFrame, stratum: Column, key: Column,
      rates: DataFrame): DataFrame = {
    val r = rates.toDF("__stratum", "__permille")
    val copies = expr("__permille DIV 1000").cast("int") +
      when(hash60(key) % 1000 < col("__permille") % 1000, 1).otherwise(0)
    df.withColumn("__stratum", stratum)
      .join(broadcast(r), Seq("__stratum"))
      .withColumn("copy_id",
        explode(when(copies >= 1, sequence(lit(1), copies))
          .otherwise(array().cast("array<int>"))))
      .drop("__stratum", "__permille")
  }

  /** Deterministic k-sample: the k rows with the smallest key hash — a
    * reproducible "random" subset with an exact size. Executes as a
    * TakeOrdered (per-partition top-k + driver merge), never a full
    * sort. */
  def hashTopK(df: DataFrame, key: Column, k: Int): DataFrame =
    df.withColumn("sample_h", hash60(key)).orderBy(col("sample_h")).limit(k)

  /** Deterministic global training-order shuffle + sharding: every row
    * gets its position in the hash-of-key permutation (`shuffle_rank`,
    * 1-based) and the training shard that position lands in (`shard` =
    * (rank-1) DIV shardSize) — the "shuffle once, write fixed-size shards"
    * step between curation and training. Seeded: different `seed` values
    * give independent permutations; equal seeds reproduce bit-identically
    * on any engine/partitioning (the [[hash60]] guarantee). The global
    * rank is [[OrderStats.withGlobalRank]]'s range-partitioned two-pass
    * construction — P parallel sorts, no single-reducer window. */
  def shuffleShards(df: DataFrame, key: Column, seed: Int,
      shardSize: Long): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    OrderStats.withGlobalRank(
      df.withColumn("shuffle_h", hash60(concat_ws("|", lit(seed), key))),
      Seq(col("shuffle_h"), key), rankCol = "shuffle_rank", totalCol = "n_rows")
      .withColumn("shard", expr(s"(shuffle_rank - 1) DIV $shardSize"))
  }
}
