package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.kg.{Link, Pipeline, Transcripts}
import graft.kg.Materialize

/** Driver contract — one entry per implemented operator (SURVEY.md §2), plus
  * DuckDB oracle SQL for the driver's correctness gate.
  *
  * The KG queries run the WHOLE pipeline (reconstruct → extract → link →
  * canonicalize → materialize) over a transcript corpus derived
  * deterministically from the driver's parquet tables
  * ([[graft.kg.Transcripts.fromTestdata]]); because the embedded facts are
  * column-derived, the DuckDB oracle recomputes the expected triples straight
  * from the source columns — an end-to-end semantic check, not a rows-only
  * smoke.
  */
object SparkEntry {

  /** Common derivation CTE for the KG oracles — mirrors
    * [[graft.kg.Transcripts.fromTestdata]] column-for-column. */
  private val kgBaseCte: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_totalprice, o_orderpriority,
      |         o_custkey % 60 + 18 AS age, o_orderkey % 5 + 1 AS items,
      |         CASE WHEN o_orderkey % 7 = 0 THEN upper(c_name) ELSE c_name END AS name_sf,
      |         n_name, lower(c_name) AS person_key, lower(n_name) AS nation_key
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |)""".stripMargin

  private def kg(spark: SparkSession, dir: String): Pipeline.Result = {
    val turns = Transcripts.fromTestdata(spark, dir)
    // Fuzzy matching is corpus-dependent config: id-like customer names
    // ("Customer#000000001") must never fuzzy-merge, so the testdata corpus
    // links via normalization only. The fuzzy path is exercised by the
    // synthetic corpus in sbt tests and kg_edges_fuzzy below.
    Pipeline.run(turns, Pipeline.emptyDict(spark), Link.Config(fuzzy = false))
  }

  /** Flagship: full KG pipeline on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    kg(spark, "/root/testdata/sf0.001").edges

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- KG pipeline (SURVEY §2.2 S1-S7) ----
    "kg_edges" -> ((s, dir) => {
      kg(s, dir).edges.orderBy(Materialize.edgeKey.map(col): _*)
    }),
    "kg_nodes" -> ((s, dir) => {
      kg(s, dir).nodes.select(col("guid"), col("entity_type"), col("name"))
        .orderBy(col("entity_type"), col("guid"))
    }),
    "kg_registry" -> ((s, dir) => {
      kg(s, dir).registry
        .select(col("entity_type"), col("norm_key"), col("canonical_key"), col("guid"))
        .orderBy(col("entity_type"), col("norm_key"))
    }),
    // conversation reconstruction: replay-deduped, stably ordered turns
    // turn 2 embeds Spark's double→string rendering of o_totalprice, which
    // is engine-specific formatting (the VALUE round-trips exactly — kg_edges
    // checks that); the text-equality oracle covers the other five turns.
    "kg_reconstruct" -> ((s, dir) => {
      import s.implicits._
      graft.kg.Reconstruct(Transcripts.fromTestdata(s, dir))
        .filter($"turn_idx" =!= 2)
        .select($"conv_id", $"turn_idx", $"role", $"text", $"tool")
        .orderBy($"conv_id", $"turn_idx")
    }),
    // the §7.3 minimum slice: entities mentioned per conversation
    "kg_mentions" -> ((s, dir) => {
      import s.implicits._
      val turns = Transcripts.fromTestdata(s, dir)
      val raw = graft.kg.Extract.extract(graft.kg.Reconstruct(turns))
      raw.filter($"subj_type" === "Person")
        .groupBy($"conv_id")
        .agg(countDistinct(Link.normKey($"subj_tuid")).as("n_persons"))
        .orderBy($"conv_id")
    }),

    // ---- classical operator demonstrators over the driver tables ----
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
    "q_window_events" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("rn", row_number().over(w))
        .withColumn("dv", $"value" - lag($"value", 1).over(w))
        .select($"event_id", $"user_id", $"event_type", $"rn", $"dv")
        .orderBy($"user_id", $"rn")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "kg_edges" ->
      s"""$kgBaseCte, tr AS (
         |  SELECT 'Person' AS subj_type, 'Person|' || person_key AS subj_id,
         |         'name' AS pred, 'string' AS obj_kind,
         |         CAST(NULL AS VARCHAR) AS obj_type, CAST(NULL AS VARCHAR) AS obj_id,
         |         name_sf AS obj_string, CAST(NULL AS BIGINT) AS obj_int64,
         |         CAST(NULL AS DOUBLE) AS obj_float64
         |  FROM base
         |  UNION ALL
         |  SELECT 'Person', 'Person|' || person_key, 'lives_in', 'subject',
         |         'Nation', 'Nation|' || nation_key, NULL, NULL, NULL FROM base
         |  UNION ALL
         |  SELECT 'Order', 'Order|' || o_orderkey, 'total', 'float64',
         |         NULL, NULL, NULL, NULL, o_totalprice FROM base
         |  UNION ALL
         |  SELECT 'Order', 'Order|' || o_orderkey, 'priority', 'string',
         |         NULL, NULL, o_orderpriority, NULL, NULL FROM base
         |  UNION ALL
         |  SELECT 'Person', 'Person|' || person_key, 'age', 'int64',
         |         NULL, NULL, NULL, age, NULL FROM base
         |  UNION ALL
         |  SELECT 'Person', 'Person|' || person_key, 'ordered_items', 'int64',
         |         NULL, NULL, NULL, items, NULL FROM base
         |)
         |SELECT DISTINCT subj_type, sha256(subj_id) AS subj_guid, pred, obj_kind,
         |       obj_type, sha256(obj_id) AS obj_guid, obj_string, obj_int64, obj_float64
         |FROM tr
         |ORDER BY subj_type, subj_guid, pred, obj_kind,
         |         obj_type NULLS FIRST, obj_guid NULLS FIRST, obj_string NULLS FIRST,
         |         obj_int64 NULLS FIRST, obj_float64 NULLS FIRST""".stripMargin,
    "kg_nodes" ->
      s"""$kgBaseCte, n AS (
         |  SELECT 'Person|' || person_key AS id, 'Person' AS entity_type,
         |         person_key AS name FROM base
         |  UNION
         |  SELECT 'Nation|' || nation_key, 'Nation', nation_key FROM base
         |  UNION
         |  SELECT 'Order|' || o_orderkey, 'Order', CAST(o_orderkey AS VARCHAR) FROM base
         |)
         |SELECT DISTINCT sha256(id) AS guid, entity_type, name FROM n
         |ORDER BY entity_type, guid""".stripMargin,
    "kg_registry" ->
      s"""$kgBaseCte, m AS (
         |  SELECT 'Person' AS entity_type, person_key AS norm_key FROM base
         |  UNION
         |  SELECT 'Nation', nation_key FROM base
         |  UNION
         |  SELECT 'Order', CAST(o_orderkey AS VARCHAR) FROM base
         |)
         |SELECT DISTINCT entity_type, norm_key, norm_key AS canonical_key,
         |       sha256(entity_type || '|' || norm_key) AS guid
         |FROM m ORDER BY entity_type, norm_key""".stripMargin,
    "kg_reconstruct" ->
      s"""$kgBaseCte, t AS (
         |  SELECT 'conv-' || o_orderkey AS conv_id, 0 AS turn_idx, 'user' AS role,
         |         'My name is ' || name_sf || '.' AS text, '' AS tool FROM base
         |  UNION ALL
         |  SELECT 'conv-' || o_orderkey, 1, 'user',
         |         name_sf || ' lives in ' || n_name || '.', '' FROM base
         |  UNION ALL
         |  SELECT 'conv-' || o_orderkey, 3, 'tool',
         |         'lookup returned ' || o_orderpriority || ' for order ' || o_orderkey,
         |         'lookup' FROM base
         |  UNION ALL
         |  SELECT 'conv-' || o_orderkey, 4, 'user',
         |         name_sf || ' is ' || age || ' years old.', '' FROM base
         |  UNION ALL
         |  SELECT 'conv-' || o_orderkey, 5, 'assistant',
         |         'They ordered ' || items || ' items.', '' FROM base
         |)
         |SELECT conv_id, turn_idx, role, text, tool FROM t
         |ORDER BY conv_id, turn_idx""".stripMargin,
    "kg_mentions" ->
      s"""$kgBaseCte
         |SELECT 'conv-' || o_orderkey AS conv_id, CAST(1 AS BIGINT) AS n_persons
         |FROM base ORDER BY conv_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |       count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_window_events" ->
      """SELECT event_id, user_id, event_type,
        |       CAST(row_number() OVER w AS INT) AS rn,
        |       value - lag(value, 1) OVER w AS dv
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin
  )
}
