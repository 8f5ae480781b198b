package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines.
  *
  * Near-duplicate detection ([[Dedup]]) emits PAIRS; a corpus clean pass
  * needs CLUSTERS — "keep one document per group of transitively-connected
  * near-dups". That transitive closure is connected components over the
  * dup-pair edge list, the standard final stage of every large-scale
  * dedup pipeline (the reference has no analog; this is north-star
  * surface).
  */
object Graph {

  /** The persisted RDD behind a `localCheckpoint`ed Dataset (its analyzed
    * plan is a `LogicalRDD` leaf over the checkpoint blocks). Those blocks
    * are invisible to `Dataset.unpersist`/`catalog.clearCache` — without
    * an explicit release they live until JVM garbage collection notices
    * the RDD object, which on a large heap can be never. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Connected components by iterative min-label propagation.
    *
    * `edges` is an undirected edge list with two long columns (src, dst by
    * position). Returns (id, cc) with cc = the minimum vertex id reachable
    * from id — a canonical, deterministic cluster label (so downstream
    * "keep doc_id == cc" is the keep-lowest rule).
    *
    * Each round every vertex takes the min label over itself and its
    * neighbors, then labels are pointer-jumped (label := label-of-label),
    * which shortcuts chains so rounds needed = O(log diameter) instead of
    * O(diameter) — `maxIter = 20` covers diameter ~2^20, far beyond any
    * real dup graph (near-dup clusters are dense, low-diameter
    * neighborhoods converging in 2-3 rounds). Per round: two shuffle
    * joins (edges⋈labels keyed on vertex id, labels⋈labels keyed on
    * label) + one aggregation — all scale-out friendly; `localCheckpoint`
    * truncates the iterative lineage so plans don't grow with rounds.
    *
    * Termination: converged when a round changed no label, capped at
    * `maxIter`; hitting the cap without convergence logs a warning (labels
    * would be partially propagated — observable instead of silently
    * wrong). The check is kept cheap two ways: (a) each round CARRIES its
    * previous label in a `prev` column, so detecting "this round was a
    * no-op" is a narrow filter over the round's already-checkpointed
    * blocks — no extra join, no recompute; (b) the check only runs every
    * SECOND round (labels are monotone non-increasing, so "round 2k was a
    * no-op" is exactly convergence; at worst one extra no-op round runs
    * before detection). Per-round driver actions: the eager
    * `localCheckpoint` plus, every other round, one block-local isEmpty —
    * half the actions of the previous check-every-round join+count. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
      scope: CacheScope = CacheScope.ambient): DataFrame = {
    val cols = edges.columns
    require(cols.length >= 2, "edge list needs (src, dst) columns")
    val e = edges.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    // symmetrize once; both directions make "min over in-neighbors" equal
    // to "min over all neighbors"
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cc"))
      .localCheckpoint()
    // the round's live checkpoint; every previous round's blocks are dead
    // the moment the next round materializes and are freed eagerly below
    // (an iterative operator must hold O(1) rounds of state, not O(n))
    var liveCkpt = labels
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("cc")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("cc")).as("nbr_cc"))
      val stepped = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cc"), coalesce(col("nbr_cc"), col("cc"))).as("cc"),
          col("cc").as("prev")) // this round's starting label, carried for the convergence check
      // pointer jumping: follow cc -> cc's own label (always <= cc since a
      // label's own label is a running min); halves remaining chain length
      // every round, giving O(log diameter) total rounds
      val next = stepped
        .join(stepped.select(col("id").as("cc"), col("cc").as("cc2")),
          Seq("cc"), "left")
        .select(col("id"), coalesce(col("cc2"), col("cc")).as("cc"),
          col("prev"))
        .localCheckpoint()
      releaseCheckpoint(liveCkpt) // previous round: dead once `next` materialized
      liveCkpt = next
      iter += 1
      if (iter % 2 == 0 || iter >= maxIter)
        converged = next.filter(col("cc") =!= col("prev")).isEmpty
      labels = next.select(col("id"), col("cc"))
    }
    releaseCheckpoint(sym) // only the loop read the symmetrized edges
    // the FINAL round's blocks back the returned frame — their lifetime
    // belongs to the caller's scope (unmanaged: until GC, as before)
    val finalCkpt = liveCkpt
    scope.onRelease(() => releaseCheckpoint(finalCkpt))
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents hit maxIter=$maxIter without converging; " +
          "cluster labels may be partially propagated")
    labels
  }

  /** Dup-pair clustering: near-dup pairs → (doc_id, cc) cluster labels
    * with cluster sizes. Docs not in any pair are not listed (they are
    * their own singleton cluster by definition). */
  def dupClusters(pairs: DataFrame,
      scope: CacheScope = CacheScope.ambient): DataFrame = {
    val cc = connectedComponents(pairs, scope = scope)
    val sizes = cc.groupBy(col("cc")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, Seq("cc"))
      .select(col("id").as("doc_id"), col("cc"), col("cluster_size"))
  }

  /** Triangle / wedge census of an undirected graph given as oriented
    * edges (a < b, two columns) — the transitivity QA for a near-dup
    * relation: a cluster whose members are pairwise-similar closes its
    * triangles; chained borderline matches don't. Returns ONE row:
    * (n_edges, n_triangles, n_wedges, clustering_coeff = 3·tri/wedges,
    * NULL when wedge-free — both engines, same guard rationale as
    * momentStats).
    *
    * Plan: the id-orientation already counts each triangle exactly once
    * ((x<y<z) matches the join pattern uniquely); both joins are keyed
    * equi-joins on vertex ids — never all-pairs. At 100 TB-graph scale
    * you'd re-orient low-degree→high-degree first (bounds the per-vertex
    * join fan-out by the arboricity instead of the max degree) — same
    * join shape, one extra degree join to pick the orientation. Wedges
    * are an exact integer aggregate over the degree table. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.toDF("a", "b")
    val tri = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), Seq("y"))
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = e.select(col("a").as("v"))
      .union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .agg(expr("SUM(d * (d - 1)) DIV 2").as("n_wedges"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(tri))
      .crossJoin(broadcast(wedges))
      .select(col("n_edges"), col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") > 0,
          lit(3.0) * col("n_triangles").cast("double") /
            col("n_wedges").cast("double")).as("clustering_coeff"))
  }
}
