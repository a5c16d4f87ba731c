package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-conformance NDJSON triple I/O.
  *
  * The reference's bulk path reads newline-delimited protojson Subgraphs —
  * one `{"triples":[...]}` object per line — with field names from
  * `subgraph/subgraph.proto` (`subject.type`, `subject.tuid`,
  * `predicate.name`, and the `object` oneof rendered as exactly one of
  * `subject|string|int64|float64`); fixture
  * `tools/megamind/cmd/testdata/subgraphs.json:1-4`, reader
  * `tools/megamind/cmd/dgraph_ingest_subgraph.go:100-170`. protojson
  * renders int64 as a JSON STRING — the schema below reads it as StringType
  * and converts, and the writer renders it back as a string, so files
  * round-trip.
  *
  * Malformed lines become null structs (counted, not fatal) — mirroring the
  * HTTP path's 400-on-malformed posture (`services/ingest/http/service.go:
  * 104-117`) in batch form.
  */
object TripleJson {

  /** protojson wire schema of one Subgraph line. */
  val subgraphJsonSchema: StructType = StructType(Seq(
    StructField("triples", ArrayType(StructType(Seq(
      StructField("subject", StructType(Seq(
        StructField("type", StringType), StructField("tuid", StringType)))),
      StructField("predicate", StructType(Seq(
        StructField("name", StringType)))),
      StructField("object", StructType(Seq(
        StructField("subject", StructType(Seq(
          StructField("type", StringType), StructField("tuid", StringType)))),
        StructField("string", StringType),
        StructField("int64", StringType), // protojson renders int64 as string
        StructField("float64", DoubleType))))))))))

  /** Read NDJSON subgraph lines → flat triple rows with a `subgraph_id`
    * lineage column (line-hash derived, deterministic) and the same column
    * layout as [[graft.model.Model.RawTriple]] minus conversation lineage. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val parsed = lines
      .withColumn("subgraph_id", sha2(col("value"), 256))
      .withColumn("sg", from_json(col("value"), subgraphJsonSchema))
      .withColumn("parse_ok", col("sg").isNotNull && col("sg.triples").isNotNull)
    parsed
      .filter(col("parse_ok"))
      .select(col("subgraph_id"), explode(col("sg.triples")).as("t"))
      .select(
        col("subgraph_id"),
        col("t.subject.type").as("subj_type"),
        col("t.subject.tuid").as("subj_tuid"),
        col("t.predicate.name").as("pred"),
        when(col("t.object.subject").isNotNull, lit("subject"))
          .when(col("t.object.string").isNotNull, lit("string"))
          .when(col("t.object.int64").isNotNull, lit("int64"))
          .when(col("t.object.float64").isNotNull, lit("float64"))
          .as("obj_kind"),
        col("t.object.subject.type").as("obj_type"),
        col("t.object.subject.tuid").as("obj_tuid"),
        col("t.object.string").as("obj_string"),
        // try_cast, not cast: ANSI mode is on, so a schema-valid line whose
        // int64 string is non-numeric/overflowing would otherwise throw and
        // kill the whole batch — contradicting the counted-not-fatal posture
        expr("try_cast(t.object.int64 AS long)").as("obj_int64"),
        col("t.object.float64").as("obj_float64"))
  }

  /** Count of malformed lines (the batch analog of HTTP 400s): lines that
    * fail to parse as a Subgraph, plus lines carrying an int64 value that
    * does not fit a long (those triples surface with a null obj_int64). */
  def malformedCount(spark: SparkSession, path: String): Long = {
    val parsed = spark.read.text(path)
      .withColumn("sg", from_json(col("value"), subgraphJsonSchema))
    val badJson = parsed
      .filter(col("sg").isNull || col("sg.triples").isNull)
      .count()
    // per-LINE semantics, matching badJson: a unique id per input line (not
    // distinct-on-text, which collapsed duplicate malformed lines into one)
    val badInt64 = parsed
      .filter(col("sg.triples").isNotNull)
      .withColumn("line_id", monotonically_increasing_id())
      .select(col("line_id"), explode(col("sg.triples")).as("t"))
      .filter(col("t.object.int64").isNotNull &&
        expr("try_cast(t.object.int64 AS long)").isNull)
      .select(col("line_id")).distinct()
      .count()
    badJson + badInt64
  }

  /** Render flat triple rows back to protojson-shaped NDJSON lines, one
    * subgraph per input `subgraph_id` group. Key order inside `object`
    * follows proto field order; int64 is rendered as a JSON string
    * (protojson convention). */
  def toJsonLines(triples: DataFrame): DataFrame = {
    // JSON string escape for scalar strings (to_json only takes structs):
    // backslash + quote + the control chars our data model can carry.
    def js(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(lit("\""),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n"), "\t", "\\\\t"),
          "\r", "\\\\r"),
        lit("\""))
    val objJson = when(col("obj_kind") === "subject",
        concat(lit("{\"subject\":{\"type\":"), js(col("obj_type")),
          lit(",\"tuid\":"), js(col("obj_tuid")), lit("}}")))
      .when(col("obj_kind") === "string",
        concat(lit("{\"string\":"), js(col("obj_string")), lit("}")))
      .when(col("obj_kind") === "int64",
        concat(lit("{\"int64\":\""), col("obj_int64").cast("string"), lit("\"}")))
      .when(col("obj_kind") === "float64",
        concat(lit("{\"float64\":"), col("obj_float64").cast("string"), lit("}")))
    val tripleJson = concat(
      lit("{\"subject\":{\"type\":"), js(col("subj_type")),
      lit(",\"tuid\":"), js(col("subj_tuid")),
      lit("},\"predicate\":{\"name\":"), js(col("pred")),
      lit("},\"object\":"), objJson, lit("}"))
    triples
      .withColumn("tj", tripleJson)
      .groupBy(col("subgraph_id"))
      .agg(concat(lit("{\"triples\":["),
        array_join(sort_array(collect_list(col("tj"))), ","), lit("]}")).as("line"))
      .select(col("subgraph_id"), col("line"))
  }

  /** The reference's per-subgraph statistics (`ingest.go:76-104`):
    * triple count and distinct-subject count. `distinct_subjects_ref`
    * reproduces the reference implementation faithfully — object-side
    * entities are NOT counted, because `countDistinctSubjects` probes the
    * map with the triple-subject's id even inside the object branch and
    * never inserts the object's id (`ingest.go:93-101`); see SURVEY §2.4.
    * `distinct_subjects_fixed` is the corrected both-sides count. */
  def subgraphStats(triples: DataFrame): DataFrame = {
    // reference identity key: separator-free Type + Tuid concat (ingest.go:88)
    val refKey = concat(col("subj_type"), col("subj_tuid"))
    val fixedSubj = concat_ws("", col("subj_type"), col("subj_tuid"))
    val fixedObj = when(col("obj_kind") === "subject",
      concat_ws("", col("obj_type"), col("obj_tuid")))
    triples.groupBy(col("subgraph_id")).agg(
      count(lit(1)).as("num_of_triples"),
      countDistinct(refKey).as("distinct_subjects_ref"),
      (size(array_distinct(flatten(collect_list(
        array_compact(array(fixedSubj, fixedObj))))))).as("distinct_subjects_fixed"))
  }
}
