package graft.kg

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model._

/** S7 — materialize the KG: deduplicated node/edge tables via idempotent
  * MERGE.
  *
  * The reference's Graph Mutator "unions subgraph to" the KG and duplicates
  * are removed (`docs/diagrams/megamind.drawio:72-75,103`); combined with
  * at-least-once delivery this is its eventual-consistency guarantee
  * (`README.md:1`): re-delivery converges to the same graph. The Spark
  * analog is an idempotent MERGE on a natural key:
  * `f(f(x)) == f(x)` and batch-order independence are property-tested.
  *
  * Backend: Iceberg `MERGE INTO` is the production path; this offline
  * environment has no Iceberg jars (verified — SURVEY §7.4), so
  * [[Materialize.mergeSnapshot]] emulates it with the same semantics:
  * read current snapshot → `unionByName` staged rows → `dropDuplicates`
  * (natural key) → write to a versioned directory → atomically flip a
  * `_CURRENT` pointer file. Readers resolve the pointer, so a crashed writer
  * never corrupts the visible snapshot.
  */
object Materialize {

  val edgeKey: Seq[String] = Seq("subj_type", "subj_guid", "pred", "obj_kind",
    "obj_type", "obj_guid", "obj_string", "obj_int64", "obj_float64")

  /** Labeled triples → deduplicated edge rows (drop lineage, collapse
    * replays/duplicates). Map-side partial aggregation makes this cheap:
    * Catalyst plans dropDuplicates as a hash aggregate with partial+final. */
  def edges(labeled: DataFrame): DataFrame =
    labeled.select(edgeKey.map(col): _*).dropDuplicates(edgeKey)

  /** Canonical entity nodes from the registry: one row per guid, with the
    * canonical key as deterministic display name. */
  def nodes(registry: DataFrame): DataFrame =
    registry.groupBy(col("guid"), col("entity_type"))
      .agg(min(col("canonical_key")).as("name"))

  // ---- snapshot MERGE emulation --------------------------------------------

  private def currentPointer(table: String): Path = Paths.get(table, "_CURRENT")

  /** Resolve the live snapshot dir, or None if the table does not exist. */
  def currentSnapshot(table: String): Option[String] = {
    val p = currentPointer(table)
    if (Files.exists(p)) Some(Paths.get(table, Files.readString(p).trim).toString)
    else None
  }

  def readTable(spark: SparkSession, table: String): Option[DataFrame] =
    currentSnapshot(table).map(spark.read.parquet(_))

  /** MERGE staged rows into `table` on `key`: insert-if-absent semantics
    * (duplicates collapse; reruns are no-ops). With `replace = true` the
    * staged frame REPLACES the table (compaction/rewrite jobs) — still via
    * the same atomic snapshot flip. Returns the merged frame.
    */
  def mergeSnapshot(spark: SparkSession, table: String, staged: DataFrame,
      key: Seq[String], replace: Boolean = false): DataFrame = {
    val merged = readTable(spark, table) match {
      case Some(existing) if !replace =>
        existing.unionByName(staged).dropDuplicates(key)
      case _ => staged.dropDuplicates(key)
    }
    val next = currentSnapshot(table) match {
      case Some(cur) => cur.split("snap-").last.toLong + 1
      case None => 0L
    }
    val snapDir = s"snap-$next"
    Files.createDirectories(Paths.get(table))
    merged.write.mode(SaveMode.Overwrite).parquet(Paths.get(table, snapDir).toString)
    // atomic pointer flip: write tmp, ATOMIC_MOVE over _CURRENT
    val tmp = Paths.get(table, "_CURRENT.tmp")
    Files.writeString(tmp, snapDir)
    Files.move(tmp, currentPointer(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    spark.read.parquet(Paths.get(table, snapDir).toString)
  }
}
