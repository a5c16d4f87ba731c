package graft.kg

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Model._

/** Incremental/resumable execution with per-partition checkpoints, lineage
  * and metrics (north rule: "checkpoint per-partition progress with
  * lineage + metrics so any stage is resumable").
  *
  * The input is split into `nBuckets` deterministic conv_id hash buckets;
  * each bucket runs the full pipeline and MERGEs into the output tables,
  * then appends a `_checkpoints` row. A restarted run consults the table and
  * skips completed buckets — safe because the sink is an idempotent MERGE
  * and GUIDs are content-derived (re-processing a bucket is a no-op).
  *
  * Linking across batches mirrors megamind's architecture: per-bucket
  * linking is exact/dictionary (synchronous, like the Entity Registry
  * lookup), while FUZZY canonicalization runs as a separate global
  * compaction pass [[Incremental.resolveDisjoint]] over the accumulated
  * node table — the batch analog of megamind's asynchronous Disjoint
  * Watcher → Disjoint Resolver loop (`docs/diagrams/megamind.drawio:80-113`):
  * the graph is eventually consistent, converging when the resolver runs.
  */
object Incremental {

  final case class Checkpoint(run_id: String, stage: String, partition_key: Int,
      status: String, rows_in: Long, rows_out: Long, started_ms: Long, finished_ms: Long)

  private def cpPath(outDir: String) = s"$outDir/_checkpoints"
  private def metricsPath(outDir: String) = s"$outDir/_metrics"

  def readCheckpoints(spark: SparkSession, outDir: String): DataFrame = {
    if (Files.exists(Paths.get(cpPath(outDir))))
      spark.read.parquet(cpPath(outDir))
    else {
      import spark.implicits._
      Seq.empty[Checkpoint].toDF()
    }
  }

  def completedBuckets(spark: SparkSession, outDir: String, runId: String): Set[Int] =
    readCheckpoints(spark, outDir)
      .filter(col("run_id") === runId && col("status") === "done" &&
        col("stage") === "pipeline")
      .select("partition_key").collect().map(_.getInt(0)).toSet

  private def appendCheckpoint(spark: SparkSession, outDir: String, cp: Checkpoint): Unit = {
    import spark.implicits._
    Seq(cp).toDF().coalesce(1).write.mode(SaveMode.Append).parquet(cpPath(outDir))
  }

  private def appendMetrics(spark: SparkSession, outDir: String,
      rows: Seq[(String, String, Int, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("run_id", "stage", "partition_key", "metric", "value")
      .coalesce(1).write.mode(SaveMode.Append).parquet(metricsPath(outDir))
  }

  /** Run (or resume) `runId` over the transcript table. Returns the number
    * of buckets actually processed this invocation. */
  def run(turns: Dataset[Turn], dict: DataFrame, outDir: String, runId: String,
      nBuckets: Int = 16,
      linkCfg: Link.Config = Link.Config(fuzzy = false),
      failAtBucket: Option[Int] = None,
      recordCounts: Boolean = true,
      compactEvery: Int = 8): Int = {
    val spark = turns.sparkSession
    Files.createDirectories(Paths.get(outDir))
    val done = completedBuckets(spark, outDir, runId)
    val todo = (0 until nBuckets).filterNot(done.contains)
    if (todo.isEmpty) return 0
    // materialize the input once — each bucket filters the checkpoint
    // instead of re-running the upstream derivation per bucket. (At cluster
    // scale the input IS a table; this matters when `turns` is computed.)
    val input = turns.localCheckpoint(eager = true)
    var processed = 0
    todo.foreach { b =>
      failAtBucket.foreach(f => if (f == b)
        throw new RuntimeException(s"injected failure at bucket $b"))
      val t0 = System.currentTimeMillis()
      val slice = input.filter(pmod(hash(col("conv_id")), lit(nBuckets)) === b)
      val rowsIn = if (recordCounts) slice.count() else -1L
      val lshSeqBefore = graft.ops.CapMetrics.seqOf("link.lsh")
      val r = Pipeline.run(slice, dict, linkCfg)
      // per-bucket DELTA append: O(bucket) bytes written per bucket instead
      // of a full-table rewrite (the old rewrite-per-bucket was O(B^2) write
      // amplification across B buckets); merge-on-read keeps the table
      // consistent between compactions, compact() below bounds read cost
      Materialize.appendDelta(spark, s"$outDir/edges", r.edges,
        Materialize.edgeKey, compactEvery = compactEvery)
      Materialize.appendDelta(spark, s"$outDir/nodes", r.nodes,
        Seq("guid", "entity_type"), compactEvery = compactEvery)
      val rowsOut =
        if (recordCounts) Materialize.readTable(spark, s"$outDir/edges").get.count()
        else -1L
      // free this bucket's pipeline caches (raw-triple persist + registry
      // checkpoint) — without this, blocks accumulate once per bucket for
      // the whole session (merged tables are parquet-backed, independent)
      r.close()
      appendCheckpoint(spark, outDir,
        Checkpoint(runId, "pipeline", b, "done", rowsIn, rowsOut,
          t0, System.currentTimeMillis()))
      // cap observability into the run's _metrics table ("no silent caps"):
      // fuzzy LSH bucket drops for THIS bucket's linking pass — recorded
      // only if the site fired during this bucket (seq advanced), never
      // another query's stale values
      val lshCaps =
        if (graft.ops.CapMetrics.seqOf("link.lsh") > lshSeqBefore)
          graft.ops.CapMetrics.latest("link.lsh").toSeq.map {
            case (k, v) => (runId, "link.lsh", b, k, v)
          }
        else Seq.empty
      appendMetrics(spark, outDir, Seq(
        (runId, "pipeline", b, "rows_in", rowsIn),
        (runId, "pipeline", b, "edges_total_after", rowsOut)) ++ lshCaps)
      processed += 1
    }
    // end-of-run compaction: fold trailing deltas into a fresh base so
    // steady-state reads pay zero merge-on-read cost
    Materialize.compact(spark, s"$outDir/edges")
    Materialize.compact(spark, s"$outDir/nodes")
    input.unpersist()
    processed
  }

  /** Global fuzzy-canonicalization compaction — megamind's Disjoint Resolver
    * as a batch job. Reads the accumulated node table, finds same-entity
    * classes via MinHash/LSH + CC over canonical names, rewrites edge/node
    * GUIDs to the class representative, and MERGEs back. Idempotent:
    * a second invocation finds only singleton classes and changes nothing.
    */
  def resolveDisjoint(spark: SparkSession, outDir: String,
      cfg: Link.Config = Link.Config()): Unit = {
    val nodesOpt = Materialize.readTable(spark, s"$outDir/nodes")
    val edgesOpt = Materialize.readTable(spark, s"$outDir/edges")
    if (nodesOpt.isEmpty || edgesOpt.isEmpty) return
    val nodes = nodesOpt.get
    val edges = edgesOpt.get

    val keys = nodes.select(col("entity_type"), col("name").as("dict_key"))
    val sameAs = Link.fuzzySameAs(keys, cfg)
    val cc = Canonicalize.connectedComponents(
        sameAs.select(col("entity_type"), col("key_a"), col("key_b")))
      .select(col("entity_type").as("cc_et"), col("key").as("cc_key"),
        col("component"))

    // guid rewrite map: old guid -> canonical guid (only where it changes)
    val rewrite = nodes.join(cc,
        nodes("entity_type") === cc("cc_et") && nodes("name") === cc("cc_key"))
      .filter(col("name") =!= col("component"))
      .select(col("guid").as("old_guid"),
        Link.guidFor(col("entity_type"), col("component")).as("new_guid"),
        col("entity_type").as("rw_et"), col("component").as("new_name"))
      .localCheckpoint(eager = true)

    if (rewrite.isEmpty) return

    // size-gated broadcast (rewrite is checkpointed, count is cheap): an
    // explicit hint is never demoted by AQE, so only hint when measured
    // small; above the gate the planner/AQE pick the join side
    val hintBc = rewrite.count() <= cfg.maxBroadcastRegistryRows
    def bc(df: DataFrame): DataFrame = if (hintBc) broadcast(df) else df
    val rwSubj = bc(rewrite.select(col("old_guid").as("s_old"), col("new_guid").as("s_new")))
    val rwObj = bc(rewrite.select(col("old_guid").as("o_old"), col("new_guid").as("o_new")))
    val newEdges = edges
      .join(rwSubj, col("subj_guid") === col("s_old"), "left")
      .join(rwObj, col("obj_guid") === col("o_old"), "left")
      .select(
        col("subj_type"),
        coalesce(col("s_new"), col("subj_guid")).as("subj_guid"),
        col("pred"), col("obj_kind"), col("obj_type"),
        coalesce(col("o_new"), col("obj_guid")).as("obj_guid"),
        col("obj_string"), col("obj_int64"), col("obj_float64"))
      .dropDuplicates(Materialize.edgeKey)

    val newNodes = nodes
      .join(bc(rewrite.select(col("old_guid"), col("new_guid"), col("new_name"))),
        col("guid") === col("old_guid"), "left")
      .select(coalesce(col("new_guid"), col("guid")).as("guid"),
        col("entity_type"),
        coalesce(col("new_name"), col("name")).as("name"))
      .groupBy(col("guid"), col("entity_type")).agg(min(col("name")).as("name"))

    // full-replace semantics for a compaction: write fresh snapshots
    Materialize.mergeSnapshot(spark, s"$outDir/edges",
      newEdges, Materialize.edgeKey, replace = true)
    Materialize.mergeSnapshot(spark, s"$outDir/nodes",
      newNodes, Seq("guid", "entity_type"), replace = true)
  }
}
