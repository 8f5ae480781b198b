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

  private def tri(pairs: (Long, Long)*): (Long, Long, Long, Option[Double]) = {
    val r = Graph.triangleStats(edges(pairs: _*)).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))
  }

  test("triangleStats: path has wedges but no triangle; K3 closes one") {
    // path 1-2-3: one wedge at 2, no triangle, coefficient 0
    assert(tri(1L -> 2L, 2L -> 3L) === ((2L, 0L, 1L, Some(0.0))))
    // K3: 3 wedges, 1 triangle, coefficient 3·1/3 = 1
    assert(tri(1L -> 2L, 2L -> 3L, 1L -> 3L) === ((3L, 1L, 3L, Some(1.0))))
    // K4: C(4,3)=4 triangles, 4·C(3,2)=12 wedges, coefficient 1
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield a -> b
    assert(tri(k4: _*) === ((6L, 4L, 12L, Some(1.0))))
  }

  test("triangleStats: single disjoint edges are wedge-free, coeff NULL") {
    assert(tri(1L -> 2L, 5L -> 6L) === ((2L, 0L, 0L, None)))
  }

  test("pageRank: integer damped updates on a path agree with hand math") {
    // path 1-2-3, symmetric: outdeg 1,2,1. Round 1: contributions
    // 1e9→2, 5e8→{1,3}, 1e9→2 → scores (575e6, 1850e6, 575e6).
    // Round 2: 575e6→2, 925e6→{1,3}, 575e6→2 →
    //   s1 = s3 = 15e7 + (925e6·85)//100 = 936_250_000
    //   s2 = 15e7 + (1150e6·85)//100 = 1_127_500_000
    val got = Graph.pageRank(edges(1L -> 2L, 2L -> 3L), iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> ((1L, 936250000L)),
      2L -> ((2L, 1127500000L)),
      3L -> ((1L, 936250000L))))
  }

  test("pageRank: scores follow a vertex relabeling exactly") {
    // integer arithmetic means relabeling vertices (id -> 7·id + 3)
    // permutes scores bit-for-bit — no positional or ordering dependence
    val es = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 2L -> 4L, 5L -> 6L)
    val base = Graph.pageRank(edges(es: _*)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val mapped = Graph.pageRank(
      edges(es.map { case (a, b) => (7 * a + 3) -> (7 * b + 3) }: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(base.map { case (id, s) => (7 * id + 3) -> s } === mapped)
    // damped-update mass bounds: every score within [0.15e9, N*1e9]
    assert(base.values.forall(s => s >= 150000000L && s <= 6000000000L))
  }

  test("pageRank: endpoint symmetry and hub dominance on a star") {
    // star center 9 with 3 leaves: leaves identical, center highest
    val got = Graph.pageRank(edges(9L -> 1L, 9L -> 2L, 9L -> 3L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(9L) > got(1L))
  }

  private def coreOf(k: Int, pairs: (Long, Long)*): Map[Long, Long] =
    Graph.kCore(edges(pairs: _*), k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: pendant chain peels away, triangle core survives with deg 2") {
    // triangle {1,2,3} with a tail 3-4-5: k=2 peels 5, then 4, leaving
    // the triangle — a MULTI-ROUND peel (depth 2), each member at deg 2
    val got = coreOf(2, 1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: k above the max degree empties the graph; k=1 keeps all") {
    val es = Seq(1L -> 2L, 2L -> 3L)
    assert(coreOf(5, es: _*) === Map.empty)
    assert(coreOf(1, es: _*) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("kCore: deep peel — a long path under k=2 erodes from both ends") {
    // path 1-2-...-12 has no 2-core at all, but needs ~6 peel rounds to
    // discover it (each round only exposes the next layer of endpoints)
    val path = (1L until 12L).map(i => i -> (i + 1))
    assert(coreOf(2, path: _*) === Map.empty)
    // a cycle, by contrast, IS its own 2-core (no endpoint to start from)
    val cycle = path :+ (12L -> 1L)
    assert(coreOf(2, cycle: _*) === (1L to 12L).map(_ -> 2L).toMap)
  }

  private def lpaOf(rounds: Int, pairs: (Long, Long)*): Map[Long, Long] =
    Graph.labelPropagation(edges(pairs: _*), rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: barbell splits where CC fuses") {
    // two 4-cliques joined by ONE bridge edge 4-5: connected components
    // collapse everything to one label, but each clique's majority vote
    // holds its own side — the case LPA exists for
    val cliqueA = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val cliqueB = Seq(5L -> 6L, 5L -> 7L, 5L -> 8L, 6L -> 7L, 6L -> 8L, 7L -> 8L)
    val got = lpaOf(4, (cliqueA ++ cliqueB :+ (4L -> 5L)): _*)
    assert(Set(1L, 2L, 3L, 4L).map(got) === Set(1L))
    assert(Set(5L, 6L, 7L, 8L).map(got) === Set(5L))
    assert(labelsOf((cliqueA ++ cliqueB :+ (4L -> 5L)): _*)
      .values.toSet === Set(1L)) // the same graph under CC: ONE component
  }

  test("labelPropagation: min-label tie-break is deterministic") {
    // triangle: every vertex sees two neighbor labels once each (tie) —
    // round 1 adopts the smallest, round 2 converges everyone to 1
    val got = lpaOf(4, 1L -> 2L, 2L -> 3L, 1L -> 3L)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("mergeComponents: a new edge chains two old components to the full-graph CC") {
    val old = edges(1L -> 2L, 5L -> 6L)
    val initial = Graph.connectedComponents(old)
    // new batch bridges the two components and adds a fresh vertex
    val merged = Graph.mergeComponents(initial, edges(2L -> 5L, 6L -> 9L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Graph.connectedComponents(
      edges(1L -> 2L, 5L -> 6L, 2L -> 5L, 6L -> 9L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === full)
    assert(merged.values.toSet === Set(1L)) // everything chained to min id
  }

  test("modularity: two bridged triangles hit the textbook 0.357, one blob 0") {
    val s = spark
    import s.implicits._
    val tri2 = edges(1L -> 2L, 2L -> 3L, 1L -> 3L,
      5L -> 6L, 6L -> 7L, 5L -> 7L, 3L -> 5L)
    val labels2 = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (5L, 5L), (6L, 5L), (7L, 5L)).toDF("id", "label")
    val got = Graph.modularity(tri2, labels2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(6)))).toMap
    // m=7; each triangle: e_c=3, d_c=7 → qc_num = 4·7·3 − 49 = 35
    assert(got(1L) === ((3L, 3L, 7L, 35L, 70.0 / 196.0)))
    assert(got(5L) === ((3L, 3L, 7L, 35L, 70.0 / 196.0)))
    // the whole graph as ONE community: Q must be exactly 0
    val labels1 = Seq(1L, 2L, 3L, 5L, 6L, 7L).map(i => (i, 0L))
      .toDF("id", "label")
    val q1 = Graph.modularity(tri2, labels1).collect()
    assert(q1.length === 1 && q1(0).getLong(4) === 0L &&
      q1(0).getDouble(6) === 0.0)
  }

  private def bfsOf(nSeeds: Int, maxDepth: Int, pairs: (Long, Long)*)
      : Map[Long, (Int, Long)] =
    Graph.bfsHops(edges(pairs: _*), nSeeds, maxDepth).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(1)))).toMap

  test("bfsHops: chain distances, seed attribution, unreachable excluded") {
    // seeds (2 smallest ids) = {1, 2}; chain 1-3-4-5; 2-6; island 8-9
    val got = bfsOf(2, 8,
      1L -> 3L, 3L -> 4L, 4L -> 5L, 2L -> 6L, 8L -> 9L)
    assert(got === Map(
      1L -> ((0, 1L)), 2L -> ((0, 2L)),
      3L -> ((1, 1L)), 4L -> ((2, 1L)), 5L -> ((3, 1L)),
      6L -> ((1, 2L)))) // 8, 9 unreachable from seeds: absent
  }

  test("bfsHops: equidistant vertex attributes to the SMALLEST seed") {
    // 5 is at distance 1 from both seeds 1 and 2 → seed 1 wins the tie
    val got = bfsOf(2, 8, 1L -> 5L, 2L -> 5L, 1L -> 2L)
    assert(got(5L) === ((1, 1L)))
    // seeds see each other at dist 0 of themselves, not 1 of the other
    assert(got(1L) === ((0, 1L)) && got(2L) === ((0, 2L)))
  }

  test("weightedPageRank: heavier in-edge wins; sink collects, leaks nothing in") {
    val s = spark
    import s.implicits._
    // A splits 3:1 to B:C; B and C return all mass to A. D is a sink
    // fed 1 from A? — no: keep D sink-only via C→D… simplest: A→B w3,
    // A→C w1, B→A w4, C→D w1: D has wout 0 (sink) and still scores.
    val e = Seq(("A", "B", 3L), ("A", "C", 1L), ("B", "A", 4L), ("C", "D", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.weightedPageRank(e, iters = 1).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // iteration 1 from 1e9 each: in(B) = 1e9·3 DIV 4 = 75e7 →
    // score(B) = 15e7 + 75e7·85 DIV 100; in(C) = 25e7; in(A) = 1e9;
    // in(D) = 1e9·1 DIV 1 = 1e9
    assert(r("B") === ((4L, 150000000L + 750000000L * 85 / 100)))
    assert(r("C") === ((1L, 150000000L + 250000000L * 85 / 100)))
    assert(r("A") === ((4L, 150000000L + 1000000000L * 85 / 100)))
    assert(r("D") === ((0L, 150000000L + 1000000000L * 85 / 100)))
  }

  test("assortativity: star is exactly −1, regular graph NULLs") {
    val s = spark
    import s.implicits._
    // 3-spoke star: endpoint degree pairs (3,1)³ ∪ (1,3)³ → the exact
    // integer moments cancel to corr = −36/√36/√36 = −1.0 precisely
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = Graph.assortativity(star).head()
    assert(r.getLong(0) === 6L)
    assert(r.getDouble(1) === -1.0)
    // triangle: every degree 2 → zero variance → NULL corr, not NaN
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.assortativity(tri).head().isNullAt(1))
  }

  test("bfsHops: maxDepth truncates exactly like the unrolled definition") {
    // path 1-10-11-12-13: with maxDepth=2 only dist <= 2 appears
    val got = bfsOf(1, 2, 1L -> 10L, 10L -> 11L, 11L -> 12L, 12L -> 13L)
    assert(got === Map(1L -> ((0, 1L)), 10L -> ((1, 1L)), 11L -> ((2, 1L))))
  }

  test("bfsHops: shorter path through a LARGER seed beats the smaller seed") {
    // seed 2 reaches 7 in 1 hop; seed 1 needs 3 — dist wins over seed id
    val got = bfsOf(2, 8, 2L -> 7L, 1L -> 5L, 5L -> 6L, 6L -> 7L)
    assert(got(7L) === ((1, 2L)))
  }

  private def predictOf(k: Int, pairs: (Long, Long)*): Seq[(Long, Long, Long, Long)] =
    Graph.linkPrediction(edges(pairs: _*), k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("linkPrediction: path predicts the closing pair with RA = 1e6 DIV deg(apex)") {
    // 1-2-3: only candidate (1,3) through apex 2 (deg 2) → 500000
    assert(predictOf(10, 1L -> 2L, 2L -> 3L) === Seq((1L, 3L, 1L, 500000L)))
  }

  test("linkPrediction: clique has no missing edges — empty output") {
    assert(predictOf(10, 1L -> 2L, 2L -> 3L, 1L -> 3L).isEmpty)
  }

  test("linkPrediction: two shared neighbors sum their RA terms exactly") {
    // 4-cycle 1-2-3-4: (1,3) shares apexes 2,4 (each deg 2) → n_common 2,
    // ra 1000000; same for (2,4) — rank ties break on (node_a, node_b)
    val got = predictOf(10, 1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L)
    assert(got === Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  private def harmonicOf(depth: Int, pairs: (Long, Long)*): Seq[(Long, Long, Long)] =
    Graph.harmonicCentrality(edges(pairs: _*), depth).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("harmonicCentrality: path hand-math — middle node dominates") {
    // 1-2-3: H(1)=1e6+5e5, H(2)=2e6, H(3)=1e6+5e5
    assert(harmonicOf(6, 1L -> 2L, 2L -> 3L) ===
      Seq((1L, 1500000L, 2L), (2L, 2000000L, 2L), (3L, 1500000L, 2L)))
  }

  test("harmonicCentrality: unreachable pairs contribute exactly zero") {
    // two disjoint edges: every node sees only its partner
    assert(harmonicOf(6, 1L -> 2L, 10L -> 11L) ===
      Seq((1L, 1000000L, 1L), (2L, 1000000L, 1L),
        (10L, 1000000L, 1L), (11L, 1000000L, 1L)))
  }

  test("harmonicCentrality: maxDepth truncates exactly like the unrolled sum") {
    // path 1-2-3-4 at depth 1: only direct neighbors count
    assert(harmonicOf(1, 1L -> 2L, 2L -> 3L, 3L -> 4L) ===
      Seq((1L, 1000000L, 1L), (2L, 2000000L, 2L),
        (3L, 2000000L, 2L), (4L, 1000000L, 1L)))
  }

  test("harmonicCentralitySampled: mod 1 == exact form; mod 2 hand-math") {
    val g = edges(1L -> 2L, 2L -> 3L, 3L -> 4L)
    // sampleMod=1 samples every source and scales by 1 — bit-equal to
    // the exact centrality, column names aside
    val exact = Graph.harmonicCentrality(g, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val full = Graph.harmonicCentralitySampled(g, 6, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(full === exact)
    // sampleMod=2 on path 1-2-3-4: sources {2, 4}.
    // d(2,·): 1->1, 3->1, 4->2; d(4,·): 1->3, 2->2, 3->1.
    // est(1) = 2*(1e6 + 1e6/3) = 2666666; est(2) = 2*(5e5) = 1000000;
    // est(3) = 2*(1e6 + 1e6) = 4000000; est(4) = 2*(5e5) = 1000000.
    val sampled = Graph.harmonicCentralitySampled(g, 6, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(sampled === Seq((1L, 2666666L, 2L), (2L, 1000000L, 1L),
      (3L, 4000000L, 2L), (4L, 1000000L, 1L)))
  }

  test("linkPrediction: hub apex contributes less than a bottleneck apex") {
    // star apex 0 with leaves 1..4 (deg 4) plus path 10-11-12 (apex deg 2):
    // leaf pairs score 250000 each, (10,12) scores 500000 and ranks first;
    // topK truncates the integer total order deterministically
    val star = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L)
    val path = Seq(10L -> 11L, 11L -> 12L)
    val got = predictOf(3, (star ++ path): _*)
    assert(got === Seq((10L, 12L, 1L, 500000L),
      (1L, 2L, 1L, 250000L), (1L, 3L, 1L, 250000L)))
  }
}
