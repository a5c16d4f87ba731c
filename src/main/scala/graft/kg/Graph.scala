package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over an edge list — the "query the graph you built"
  * surface (composes with the constructed KG's (subj_guid, obj_guid) edges,
  * or any (src, dst) frame).
  *
  * [[Graph.pageRank]] is the fixed-iteration power method:
  * `rank_{t+1}(v) = (1-d)/N + d * sum_{u->v} rank_t(u) / outdeg(u)`,
  * WITHOUT dangling-mass redistribution (a sink's rank mass leaks; fixed
  * iterations keep the result a pure deterministic function of the edge
  * list, which is what makes it oracle-able). Each iteration is one keyed
  * join + one aggregation; lineage is truncated per iteration
  * (localCheckpoint) so 10 iterations do not build a 10-deep plan. No data
  * ever collects to the driver.
  */
object Graph {

  /** Distinct-edge PageRank. `edges` needs (src, dst) columns; multi-edges
    * collapse. Returns (node, rank). */
  def pageRank(edges: DataFrame, iters: Int = 10, damping: Double = 0.85): DataFrame = {
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
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("c"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("c"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(eager = true)
      ranks.unpersist()
      ranks = next
    }
    ranks
  }
}
