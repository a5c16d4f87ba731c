package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model._

/** End-to-end KG construction: S1 scan → S2 reconstruct → S3 extract →
  * S4/S5 link+label → S6 canonicalize → S7 materialize.
  *
  * The reference's event-driven microservice chain
  * (Ingester → Entity Registry → Graph Mutator → Disjoint Resolver,
  * `docs/diagrams/megamind.drawio`) re-expressed as one declarative Spark
  * job; each Knative hop becomes a shuffle boundary Catalyst can optimize
  * across.
  */
object Pipeline {

  final case class Result(edges: DataFrame, nodes: DataFrame, registry: DataFrame)

  def emptyDict(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField("entity_type", StringType),
        StructField("variant_norm", StringType),
        StructField("canonical_norm", StringType))))
  }

  /** The alias dictionary for the synthetic corpus: full-name variants of the
    * hot first-name aliases (the curated hot-entity table the pipeline gets
    * as input — megamind's Entity Registry seed). */
  def syntheticDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val lastNames = Seq("Smith", "Jones", "Lee", "Garcia", "Chen", "Patel",
      "Kim", "Nguyen", "Brown", "Davis", "Miller", "Wilson")
    Transcripts.aliasPairs.flatMap { case (variant, canonical) =>
      lastNames.map { ln =>
        ("Person", s"$variant $ln".toLowerCase, s"$canonical $ln".toLowerCase)
      }
    }.toDF("entity_type", "variant_norm", "canonical_norm")
  }

  def run(turns: Dataset[Turn], dict: DataFrame,
      linkCfg: Link.Config = Link.Config()): Result = {
    // fused S2+S3 (dedup + order + extract, one shuffle). Materialized once:
    // raw triples feed four downstream subtrees (subject mentions, object
    // mentions, fuzzy linking, labeling) and Spark does not share common
    // subplans across join sides — without the cut the extraction re-runs
    // per consumer. SERIALIZED cache, not localCheckpoint: the raw-triple
    // frame is the big one (≈1 row/turn), and deserialized checkpoint blocks
    // hit a memory cliff ~4x earlier (measured: 10.7M turns fine, 21M turns
    // 5x slowdown). On a cluster this boundary is a staging table.
    val raw = Extract.extract(turns)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val reg = Link.registry(raw, dict, linkCfg).localCheckpoint(eager = true)
    val labeled = Link.label(raw, reg)
    Result(Materialize.edges(labeled), Materialize.nodes(reg), reg)
  }

  /** Run + persist with idempotent MERGE into `outDir/{edges,nodes}`. */
  def runAndMerge(turns: Dataset[Turn], dict: DataFrame, outDir: String,
      linkCfg: Link.Config = Link.Config()): Result = {
    val spark = turns.sparkSession
    val r = run(turns, dict, linkCfg)
    val mergedEdges = Materialize.mergeSnapshot(spark, s"$outDir/edges", r.edges,
      Materialize.edgeKey)
    val mergedNodes = Materialize.mergeSnapshot(spark, s"$outDir/nodes", r.nodes,
      Seq("guid", "entity_type"))
    Result(mergedEdges, mergedNodes, r.registry)
  }
}
