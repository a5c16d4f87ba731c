package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over an edge list — the "query the graph you built"
  * surface (composes with the constructed KG's (subj_guid, obj_guid) edges,
  * or any (src, dst) frame).
  *
  * [[Graph.pageRank]] is the power method:
  * `rank_{t+1}(v) = (1-d)/N + d * (sum_{u->v} rank_t(u) / outdeg(u) [+ S_t/N])`
  * where `S_t` is the dangling (sink) rank mass, redistributed uniformly
  * when `danglingRedistribution = true` — textbook PageRank, total mass
  * conserved at 1. The DEFAULT leaves it off: a sink's mass leaks, but the
  * result stays a pure deterministic function of the edge list alone, which
  * is what makes the driver oracle (`q_pagerank`, an unrolled recursive
  * CTE) recomputable in DuckDB — a user who wants textbook ranks passes
  * `danglingRedistribution = true` and mirrors the `S_t/N` term in any
  * external check. `tol > 0` adds an L1-convergence early exit (one extra
  * aggregate per iteration); the default 0 keeps the fixed-iteration count
  * exact for the oracle. Each iteration is one keyed join + one
  * aggregation; lineage is truncated per iteration (localCheckpoint) so 10
  * iterations do not build a 10-deep plan. Per-iteration driver traffic is
  * O(1) scalars (dangling mass, L1 delta) — node/edge data never collects.
  */
object Graph {

  /** Distinct-edge PageRank. `edges` needs (src, dst) columns; multi-edges
    * collapse. Returns (node, rank). */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      danglingRedistribution: Boolean = false, tol: Double = 0.0): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = true)
    val n = nodes.count()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = true)

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint(eager = true)
    var iter = 0
    var converged = false
    while (iter < iters && !converged) {
      // dangling mass: rank held by nodes with no out-edges this iteration
      // (one scalar agg — the left anti join is a broadcast of outdeg keys)
      val dangling =
        if (!danglingRedistribution) 0.0
        else {
          val row = ranks.join(outdeg, ranks("node") === outdeg("src"), "left_anti")
            .agg(sum(col("rank"))).head()
          if (row.isNullAt(0)) 0.0 else row.getDouble(0)
        }
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("c"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n + damping * dangling / n) +
            lit(damping) * coalesce(col("c"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(eager = true)
      if (tol > 0.0) {
        val row = next.as("nx").join(ranks.as("pv"), col("nx.node") === col("pv.node"))
          .agg(sum(abs(col("nx.rank") - col("pv.rank")))).head()
        val delta = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
        converged = delta < tol
      }
      ranks.unpersist()
      ranks = next
      iter += 1
    }
    ranks
  }

  /** Bounded-depth BFS from `seeds` over a DIRECTED edge list: every node
    * reachable within `k` hops, with its hop distance (`min_hops`, seeds
    * at 0). One keyed join + anti-join per hop — the frontier and visited
    * sets stay distributed (no driver collect); lineage is truncated per
    * hop (localCheckpoint) so depth never builds a k-deep plan; the loop
    * exits early when a frontier empties (one O(1) isEmpty probe per hop).
    * This is the general traversal the 2-hop query specializes: ego
    * networks, reachability cones, provenance closures over the KG's
    * (subj_guid, obj_guid) edges. */
  def kHop(edges: DataFrame, seeds: DataFrame, k: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(eager = true)
    var visited = seeds.select(col("node")).distinct()
      .withColumn("min_hops", lit(0)).localCheckpoint(eager = true)
    var frontier = visited.select(col("node"))
    var hop = 0
    var drained = false
    while (hop < k && !drained) {
      hop += 1
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("min_hops", lit(hop))
        .localCheckpoint(eager = true)
      drained = next.isEmpty
      val grown = visited.unionByName(next).localCheckpoint(eager = true)
      visited.unpersist()
      visited = grown
      frontier = next.select(col("node"))
    }
    e.unpersist()
    visited
  }

  /** Triangle enumeration over an UNDIRECTED canonical edge list (`a` <
    * `b`, one row per edge — the shape the dedup pair ops emit). Returns
    * every (a, b, c) with a < b < c and all three edges present.
    *
    * Plan shape: two hash/sort-merge EQUI-joins — wedges (a<b, b<c) closed
    * by probing the edge set for (a, c). The canonical ordering is the
    * classic enumeration guard: each triangle is emitted exactly once, and
    * each wedge is generated only at its middle-ranked vertex, so a
    * degree-d node generates O(d_lo × d_hi) wedges rather than O(d²) —
    * for skew-heavy graphs re-rank ids by degree first (cheapest id =
    * lowest degree) to tighten that bound; the id order used here keeps
    * the output a pure function of the input for the DuckDB oracle. No
    * cartesian, no driver-side state; candidates never exceed the wedge
    * count (Σ d_lo·d_hi), the same budget any distributed triangle count
    * (e.g. Cohen's MapReduce construction) pays. */
  def triangles(pairs: DataFrame): DataFrame = {
    // the edge set feeds THREE subtrees (both wedge sides + the closure
    // probe) and Spark has no CSE — materialize once or an expensive
    // upstream (a PPJoin pipeline, say) runs three times
    val e = pairs.select(col("a"), col("b")).distinct()
      .localCheckpoint(/* eager = */ true)
    // wedges a<b<c sharing middle vertex b… join on (a,c) closes them
    e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      .select(col("a"), col("b"), col("c"))
  }
}
