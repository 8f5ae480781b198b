package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Similarity-search family over `embeddings`: exact brute-force cosine
  * top-k (oracle-checked bit-exactly — see Similarity's sequential-fold
  * determinism contract) and the sign-LSH bucketed scale path (approximate
  * by contract → rows-only driver check). */
object SimQueries extends QueryFamily {

  private val K = 3

  private def queriesSubset(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") % 5 === 0)

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "sim_topk_bruteforce" -> ((s, d) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, d), queriesSubset(s, d), K)
        .orderBy(col("query_id"), col("rank"))),

    "sim_topk_lsh" -> ((s, d) =>
      Similarity.lshTopK(Tables.embeddings(s, d), queriesSubset(s, d), K,
        probeHamming = 1)
        .orderBy(col("query_id"), col("rank"))),

    "sim_topk_ivf" -> ((s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), queriesSubset(s, d), K,
        nCells = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))),

    "sim_label_centroid_norm" -> ((s, d) =>
      // per-label mean-vector norm: exercises vector aggregation
      // (zip_with-free: posexplode + groupBy position)
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        // per-element exact integer micros BEFORE summing: double sums are
        // order-dependent, long sums are exact
        .agg(sum(round(col("x").cast("double") * 1000000).cast("long")).as("sum_micros"),
          count(lit(1)).as("n"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("dims"), sum(col("sum_micros")).as("sum_all_micros"))
        .orderBy(col("label"))),
  )

  val oracles: ListMap[String, String] = ListMap(
    "sim_topk_bruteforce" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 5 = 0),
        |p AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |    list_reduce(list_transform(qv, (x,i) -> x * v[i]), (x,y) -> x + y) /
        |    (sqrt(list_reduce(list_transform(qv, x -> x*x), (x,y) -> x + y)) *
        |     sqrt(list_reduce(list_transform(v, x -> x*x), (x,y) -> x + y))) AS cosine
        |  FROM q CROSS JOIN e WHERE query_id <> e.vec_id)
        |SELECT query_id, rank, neighbor_id, cosine FROM (
        |  SELECT query_id, neighbor_id, cosine,
        |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM p) r
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // sim_topk_lsh / sim_topk_ivf: approximate by contract — no oracle
    // (rows-only); recall asserted in SimilaritySpec
    "sim_label_centroid_norm" ->
      """SELECT label, COUNT(*) AS dims, CAST(SUM(sum_micros) AS BIGINT) AS sum_all_micros FROM (
        |  SELECT label, pos, CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros
        |  FROM (SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS pos FROM embeddings) u
        |  GROUP BY label, pos) g
        |GROUP BY label ORDER BY label""".stripMargin,
  )
}
