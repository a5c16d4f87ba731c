package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Core data model of the KG-construction engine.
  *
  * Mirrors the reference's proto data model (`subgraph/subgraph.proto:23-49`):
  * a Subgraph is a bag of `Triple(subject, predicate, object)` where
  * `Subject{type, tuid}` and `Object` is a 4-way oneof
  * (subject | string | int64 | float64). Spark has no native sum type, so the
  * oneof is encoded as a sparse struct — `obj_kind` discriminator plus
  * exactly-one-non-null value column — which keeps Catalyst column pruning and
  * predicate pushdown intact (a UDT would be opaque to the optimizer).
  */
object Model {

  /** One transcript turn — input-table shape (conv_id, turn_idx, role, text, tool, ts). */
  final case class Turn(
      conv_id: String,
      turn_idx: Int,
      role: String,
      text: String,
      tool: String,
      ts: Timestamp)

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  /** Object-oneof discriminators (`subgraph.proto:42-49`). */
  object ObjKind {
    val Subject = "subject"
    val String = "string"
    val Int64 = "int64"
    val Float64 = "float64"
    val all: Seq[scala.Predef.String] = Seq(Subject, String, Int64, Float64)
  }

  /** A raw extracted triple, pre-linking. Subject identity is the
    * (type, tuid) pair — kept as two columns, never the reference's
    * separator-free concat (`ingest.go:88` makes ("AB","C") collide with
    * ("A","BC"); documented deviation, SURVEY §2.4).
    *
    * `conv_id`/`turn_idx` carry subgraph lineage (the reference's Subgraph
    * boundary) so per-partition checkpoint/metrics can attribute every triple.
    */
  final case class RawTriple(
      conv_id: String,
      turn_idx: Int,
      subj_type: String,
      subj_tuid: String,
      pred: String,
      obj_kind: String,
      obj_type: Option[String],   // obj_kind == subject
      obj_tuid: Option[String],   // obj_kind == subject
      obj_string: Option[String], // obj_kind == string
      obj_int64: Option[Long],    // obj_kind == int64
      obj_float64: Option[Double] // obj_kind == float64
  ) {
    /** exactly-one-non-null invariant of the oneof */
    def invariantHolds: Boolean = obj_kind match {
      case ObjKind.Subject =>
        obj_type.isDefined && obj_tuid.isDefined && obj_string.isEmpty &&
          obj_int64.isEmpty && obj_float64.isEmpty
      case ObjKind.String =>
        obj_type.isEmpty && obj_string.isDefined && obj_int64.isEmpty && obj_float64.isEmpty
      case ObjKind.Int64 =>
        obj_type.isEmpty && obj_string.isEmpty && obj_int64.isDefined && obj_float64.isEmpty
      case ObjKind.Float64 =>
        obj_type.isEmpty && obj_string.isEmpty && obj_int64.isEmpty && obj_float64.isDefined
      case _ => false
    }
  }

  /** Canonicalized KG edge/property row (post link + canonicalize).
    * `subj_guid` / `obj_guid` are deterministic content-derived ids
    * (sha-256 of type + canonical key) — idempotent across reruns, no
    * sequences or random state (SURVEY §2.2-S5).
    */
  final case class KgEdge(
      subj_type: String,
      subj_guid: String,
      pred: String,
      obj_kind: String,
      obj_type: Option[String],
      obj_guid: Option[String],
      obj_string: Option[String],
      obj_int64: Option[Long],
      obj_float64: Option[Double])

  /** KG node row: one per canonical entity. `name` = representative surface
    * form (deterministic min). */
  final case class KgNode(guid: String, entity_type: String, name: String)

  /** TUID→GUID registry row — the Spark form of megamind's Entity Registry
    * (etcd KV in `docs/diagrams/megamind.drawio:46-58`). */
  final case class TuidGuid(entity_type: String, tuid: String, guid: String)
}
