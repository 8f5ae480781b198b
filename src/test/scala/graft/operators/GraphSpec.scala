package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Connected components on hand-built graphs: multi-round label
  * propagation (path graph), multiple components, singleton edges. */
class GraphSpec extends GraftSparkSpec {

  private def edges(pairs: (Long, Long)*) =
    spark.createDataFrame(pairs).toDF("src", "dst")

  private def labelsOf(pairs: (Long, Long)*): Map[Long, Long] =
    Graph.connectedComponents(edges(pairs: _*)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single edge: both endpoints get the min id") {
    assert(labelsOf(5L -> 9L) === Map(5L -> 5L, 9L -> 5L))
  }

  test("path graph needs multi-round propagation to reach the far end") {
    // 10-9-8-...-1: min label 1 must walk 9 hops
    val path = (1L to 9L).map(i => (i + 1) -> i)
    val got = labelsOf(path: _*)
    assert(got === (1L to 10L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate labels; direction irrelevant") {
    val got = labelsOf(1L -> 2L, 2L -> 3L, 10L -> 20L, 30L -> 21L, 21L -> 35L)
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L)
    assert(got(10L) === 10L && got(20L) === 10L)
    assert(Set(30L, 21L, 35L).map(got) === Set(21L))
  }

  test("dupClusters reports sizes and keeps the min-id canonical label") {
    val cl = Graph.dupClusters(edges(1L -> 2L, 2L -> 3L, 7L -> 8L))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cl === Array((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (7L, 7L, 2L), (8L, 7L, 2L)))
  }
}
