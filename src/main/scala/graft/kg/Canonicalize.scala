package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S6 — connected-components entity resolution in DataFrame iterations.
  *
  * The reference's Disjoint Watcher / Disjoint Resolver
  * (`docs/diagrams/megamind.drawio:88,113`) partition entities into
  * same-entity classes and collapse each class to one canonical id. Here:
  * min-key label propagation over the same-as edge set, expressed purely as
  * DataFrame joins/aggregations (the north rule mandates DataFrame
  * iterations, not GraphX).
  *
  * Scale posture:
  *  - Each iteration is one shuffle (join + groupBy on the same key — the
  *    exchange is reused by Catalyst).
  *  - `localCheckpoint()` per iteration truncates lineage so the plan does
  *    not grow with iteration count.
  *  - Alias/same-as clusters in entity resolution have tiny diameters
  *    (variants of one real-world entity), so plain min-propagation converges
  *    in a handful of rounds; for adversarial long-chain graphs the
  *    large-star/small-star variant (O(log n) rounds, Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond") is the drop-in upgrade.
  *  - Convergence is detected by an aggregate count of changed labels — the
  *    only driver-side value per round (no `collect()` of data).
  */
object Canonicalize {

  /** Input: symmetric-izable edge list (entity_type, key_a, key_b).
    * Output: (entity_type, key, component) — component = min key of the
    * connected component, one row per distinct key appearing in any edge.
    */
  def connectedComponents(sameAs: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = sameAs.sparkSession
    import spark.implicits._

    // symmetric closure; (type,key) vertex set
    val fwd = sameAs.select($"entity_type", $"key_a".as("src"), $"key_b".as("dst"))
    val edges = fwd.unionByName(
        fwd.select($"entity_type", $"dst".as("src"), $"src".as("dst")))
      .distinct()
      .localCheckpoint(eager = true)

    var labels = edges.select($"entity_type", $"src".as("key"))
      .distinct()
      .withColumn("component", $"key")
      .localCheckpoint(eager = true)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // candidate label for each dst: min over neighbors' current labels
      val cand = edges
        .join(labels, edges("entity_type") === labels("entity_type") &&
          edges("src") === labels("key"))
        .groupBy(edges("entity_type").as("entity_type"), edges("dst").as("key"))
        .agg(min($"component").as("nbr_min"))

      val updated = labels.alias("l")
        .join(cand.alias("c"), Seq("entity_type", "key"), "left")
        .select($"entity_type", $"key",
          least($"l.component", coalesce($"c.nbr_min", $"l.component")).as("component"),
          ($"c.nbr_min".isNotNull && $"c.nbr_min" < $"l.component").as("changed"))
        .localCheckpoint(eager = true)

      val changed = updated.filter($"changed").limit(1).count()
      labels = updated.drop("changed")
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
