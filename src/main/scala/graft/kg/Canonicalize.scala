package graft.kg

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S6 — connected-components entity resolution.
  *
  * The reference's Disjoint Watcher / Disjoint Resolver
  * (`docs/diagrams/megamind.drawio:88,113`) partition entities into
  * same-entity classes and collapse each class to one canonical id. Here:
  * min-key labels over the same-as edge set, computed by one of two
  * strategies chosen by measured edge count (the same adaptive posture as
  * Spark's own broadcast-join threshold):
  *
  *  - '''Small edge set''' (≤ `driverThreshold` rows): union-find on the
  *    driver. Same-as edges are a similarity-join OUTPUT — pairs of distinct
  *    entity keys judged equal — which is orders of magnitude smaller than
  *    the corpus; below the threshold the DataFrame loop's per-iteration job
  *    overhead dwarfs the work (measured: 12-34 s vs <1 s at bench scale).
  *  - '''Large edge set''': min-label propagation expressed as DataFrame
  *    iterations (join + groupBy-min per round, `localCheckpoint` to
  *    truncate lineage, convergence detected by an aggregate — no data ever
  *    collected to the driver). Label propagation converges in
  *    O(component diameter) rounds; entity-resolution components are
  *    shallow (surface variants of one real entity). For adversarially deep
  *    chains the large-star/small-star algorithm (Kiveris et al. 2014) is
  *    the drop-in replacement.
  *
  * Both strategies produce identical output (property-tested): one row per
  * distinct key, labeled with the lexicographic min key of its component.
  */
object Canonicalize {

  val outputSchema: StructType = StructType(Seq(
    StructField("entity_type", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("component", StringType, nullable = false)))

  /** Input: edge list (entity_type, key_a, key_b); undirected semantics.
    * Output: (entity_type, key, component). */
  def connectedComponents(sameAs: DataFrame, maxIter: Int = 25,
      driverThreshold: Int = 2000000): DataFrame = {
    val spark = sameAs.sparkSession
    val fwd = sameAs.select(col("entity_type"), col("key_a").as("src"), col("key_b").as("dst"))
    val edges = fwd.unionByName(
      fwd.select(col("entity_type"), col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // Materialize the (small) same-as edge set once, then decide strategy
    // from its measured size. (A limit+collect probe would re-run the whole
    // upstream similarity join once per CollectLimit scale-up round —
    // measured 8x slower than checkpoint+count.)
    val cp = edges.localCheckpoint(eager = true)
    val n = cp.count()
    val out =
      if (n <= driverThreshold) driverUnionFind(spark, cp.collect())
      else labelPropagation(cp, maxIter)
    out
  }

  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      edgeRows: Array[Row]): DataFrame = {
    val parent = mutable.Map.empty[(String, String), (String, String)]
    def find(x: (String, String)): (String, String) = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val verts = mutable.Set.empty[(String, String)]
    edgeRows.foreach { r =>
      val et = r.getString(0)
      val a = (et, r.getString(1))
      val b = (et, r.getString(2))
      verts += a += b
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra._2 < rb._2) parent(rb) = ra else parent(ra) = rb }
    }
    val rows = new java.util.ArrayList[Row]()
    verts.toSeq.sorted.foreach { k =>
      rows.add(Row(k._1, k._2, find(k)._2))
    }
    spark.createDataFrame(rows, outputSchema)
  }

  private def labelPropagation(edges: DataFrame, maxIter: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    var labels = edges.select($"entity_type", $"src".as("key"))
      .distinct()
      .withColumn("component", $"key")
      .localCheckpoint(eager = true)

    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
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
      labels.unpersist()
      labels = updated.drop("changed")
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
