package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-plan audit: prints `explain(formatted)` for representative
  * queries/stages and checks the plan properties that matter at 100 TB —
  * filter/column pushdown into the parquet scan, broadcast joins for dims,
  * top-k instead of global sort, whole-stage codegen coverage. Output is
  * reviewed into PLANS.md.
  *
  * Usage: scripts/run.sh Plans [sfDir]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var failures = 0
    def audit(name: String, df: DataFrame, execute: Boolean = false)(
        checks: (String, String => Boolean)*): Unit = {
      if (execute) df.collect() // executes THIS QueryExecution → final AQE plan
      // formatted mode for structure + simple mode for codegen stars `*(n)`
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
        "\n==== simple ====\n" + df.queryExecution.executedPlan.toString
      println(s"\n########## $name ##########")
      println(formatted.take(5000))
      checks.foreach { case (label, f) =>
        val ok = f(formatted)
        if (!ok) failures += 1
        println(s"CHECK[$name] $label: ${if (ok) "PASS" else "FAIL"}")
      }
    }

    // --- scan pushdown + pruning + codegen on the classic agg ---
    audit("q1_agg", SparkEntry.queries("q1_agg")(spark, dir), execute = true)(
      "filter pushed to parquet scan" ->
        (_.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")),
      "column pruning (no l_orderkey in ReadSchema)" ->
        (s => !s.split("ReadSchema")(1).take(300).contains("l_orderkey")),
      "partial aggregation before the exchange" -> (_.contains("partial_sum")),
      "whole-stage codegen in final plan" ->
        (s => s.contains("WholeStageCodegen") || s.contains("*(")))

    // --- transcript derivation: dims must broadcast, fact never shuffles ---
    audit("transcript_derivation",
      graft.kg.Transcripts.fromTestdata(spark, dir).toDF(), execute = true)(
      "customer+nation joined via BroadcastHashJoin" ->
        (s => s.split("BroadcastHashJoin").length >= 3),
      "no shuffle exchange before the joins (broadcast only)" ->
        (s => !s.contains("ENSURE_REQUIREMENTS")))

    // --- labeling joins: registry broadcast both sides ---
    {
      val turns = graft.kg.Transcripts.fromTestdata(spark, dir)
      val raw = graft.kg.Extract.extract(turns)
      val reg = graft.kg.Link.registry(raw, graft.kg.Pipeline.emptyDict(spark),
        graft.kg.Link.Config(fuzzy = false))
      // hintBroadcast=true mirrors Pipeline.run's size gate outcome at this
      // scale (registry count is far under maxBroadcastRegistryRows)
      val edges = graft.kg.Materialize.edges(
        graft.kg.Link.label(raw, reg, hintBroadcast = true))
      audit("kg_label_edges", edges, execute = true)(
        "subject+object registry joins broadcast" ->
          (s => s.split("BroadcastHashJoin").length >= 3),
        "dedup is a hash aggregate (map-side partial)" ->
          (_.contains("HashAggregate")))

      // --- oversized-registry posture: with the size gate OFF (no hint) and
      // broadcast thresholds disabled (simulating a registry too big to
      // broadcast), labeling must degrade to a shuffle join — NOT force a
      // broadcast that would OOM at a billion distinct entities ---
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val edgesNoBc = graft.kg.Materialize.edges(
        graft.kg.Link.label(raw, reg, hintBroadcast = false))
      audit("kg_label_edges_oversized_registry", edgesNoBc, execute = true)(
        // note: BroadcastHashJoins remain in the plan for the transcript
        // derivation's dim joins (explicit, bounded); the REGISTRY joins are
        // the two LeftOuter joins, which must both shuffle here
        "both labeling joins fall back to shuffle joins" ->
          (s => s.split("Initial Plan")(0)
            .split("SortMergeJoin|ShuffledHashJoin").length >= 3),
        "no broadcast left-outer (registry) join forced" ->
          (s => !s.split("Initial Plan")(0).contains("BroadcastHashJoin LeftOuter")))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    }

    audit("q_topk_parts", SparkEntry.queries("q_topk_parts")(spark, dir), execute = true)(
      "TakeOrderedAndProject (top-k, no global sort)" ->
        (_.contains("TakeOrderedAndProject")),
      "partial aggregation before shuffle" -> (_.contains("partial_sum")))

    audit("q_semi_join", SparkEntry.queries("q_semi_join")(spark, dir), execute = true)(
      "semi join present" -> (_.contains("LeftSemi")),
      "broadcast semi join (orders side under threshold)" ->
        (s => s.contains("BroadcastHashJoin") || s.contains("BroadcastNestedLoop")))

    audit("q_window_events", SparkEntry.queries("q_window_events")(spark, dir),
      execute = true)(
      // executed AQE plans print Final + Initial sections; audit the final one
      "at most 2 exchanges total (window hash + output range)" ->
        (s => s.split("Initial Plan")(0).split("Exchange [rh]").length <= 3),
      "running window (both functions in ONE Window node)" ->
        (s => s.split("Initial Plan")(0).split("Window \\(").length == 2))

    audit("q_dedup_exact", SparkEntry.queries("q_dedup_exact")(spark, dir), execute = true)(
      "map-side partial aggregation" ->
        (s => s.contains("partial_min") || s.contains("partial_count")))

    audit("q_lang_id", SparkEntry.queries("q_lang_id")(spark, dir), execute = true)(
      // the repo rule: NO interpreted higher-order functions in text scans
      // (lambda HOFs are CodegenFallback, ~1000x slower per element)
      "no lambda higher-order functions in the plan" ->
        (s => !s.toLowerCase.contains("lambdafunction")),
      // marker scoring runs as char-loop UDF kernels (r6: java.util.regex
      // itself — a predicate lambda dispatch per character — was the
      // measured top CPU of the 400x curation rehearsal, so the regexp
      // forms were replaced by value-identical kernels); assert the scan
      // carries the kernel projections and no regex expression survives
      "marker scoring via char-loop kernels (no regex engine)" ->
        (s => s.contains("UDF") && !s.toLowerCase.contains("regexp_")))

    audit("q_top_terms", SparkEntry.queries("q_top_terms")(spark, dir), execute = true)(
      "corpus size folded into the plan (no separate driver action)" ->
        (s => s.contains("BroadcastNestedLoopJoin") || s.contains("CartesianProduct")),
      "single Window node for the per-doc rank" ->
        (s => s.split("Initial Plan")(0).split("Window \\(").length == 2))

    audit("q_fingerprint", SparkEntry.queries("q_fingerprint")(spark, dir), execute = true)(
      "custom expressions present in projection" ->
        (s => s.toLowerCase.contains("fingerprint64")),
      "inside WholeStageCodegen (native expression, no fallback)" ->
        (s => s.contains("WholeStageCodegen") || s.contains("*(")))

    // --- PPJoin similarity join: the verify stage over the eagerly-
    // checkpointed candidate frame — keyed equi-joins only. Audited via the
    // MANAGED variant: the plain ngramJaccardPairs now SEALS its result
    // behind an output checkpoint (freeing the corpus-scale internals), so
    // the query-level plan is just a checkpoint scan; the managed frame is
    // the verify plan that actually executes. ---
    {
      val m = graft.ops.Dedup.ngramJaccardPairsManaged(
        spark.read.parquet(s"$dir/documents.parquet"), shingleN = 3, minJaccard = 0.5)
      audit("q_ngram_pairs", m.pairs, execute = true)(
        "no cartesian/nested-loop product anywhere (blocked join only)" ->
          (s => !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")),
        "verify joins keyed (SortMergeJoin or hash)" ->
          (s => s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
            s.contains("BroadcastHashJoin")))
      m.free()
    }

    // --- PPJoin candidate PLAN, pre-checkpoint (candidatePairs executes it
    // eagerly and returns a checkpoint, so the audit builds it directly) ---
    {
      val shUdf = udf((t: String) =>
        graft.ops.Dedup.wordShinglesKernel(if (t == null) "" else t, 3).toSeq)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val items = docs.select(lit("_").as("grp"), col("doc_id").as("id"),
        shUdf(col("text")).as("toks"))
      val (pairs, ranked) = graft.ops.SimJoin.buildCandidates(items, 0.5, delta = false)
      audit("simjoin_candidates", pairs)(
        "pair aggregation carries the positional-filter max bound" ->
          (s => s.contains("max(ub")),
        "no cartesian/nested-loop product (prefix-token equi-join only)" ->
          (s => !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")))
      ranked.unpersist()
      // delta-resolver shape: union of (index=new ⨝ probe=all) and
      // (index=old ⨝ probe=new) — old×old pairs never enumerated
      val itemsD = items.withColumn("is_new", pmod(col("id"), lit(2)) === 0)
      val (pairsD, rankedD) = graft.ops.SimJoin.buildCandidates(itemsD, 0.5, delta = true)
      audit("simjoin_candidates_delta", pairsD)(
        "delta split is a UNION of two prefix equi-joins" ->
          (s => s.contains("Union")),
        "no cartesian product in the delta plan" ->
          (s => !s.contains("CartesianProduct")))
      rankedD.unpersist()
    }

    // --- deterministic sampling: pure projection + filter, ZERO exchanges
    // before the (output-ordering) sort — the whole point of hash-bucket
    // sampling over sampleBy ---
    audit("q_stratified", SparkEntry.queries("q_stratified")(spark, dir),
      execute = true)(
      "no shuffle except the output sort (one Exchange at most)" ->
        (s => s.split("Initial Plan")(0).split("Exchange").length <= 2),
      "fingerprint64 evaluated inline (codegen'd projection)" ->
        (s => s.toLowerCase.contains("fingerprint64") &&
          (s.contains("WholeStageCodegen") || s.contains("*("))))

    // --- delta dedup: the corpus side must collapse to distinct hashes
    // BEFORE the join (partial agg — the shuffle carries one row per
    // distinct text, never per doc), and every join is keyed ---
    audit("q_dedup_delta", SparkEntry.queries("q_dedup_delta")(spark, dir),
      execute = true)(
      "corpus hashes deduped via hash aggregate (map-side partial)" ->
        (s => s.contains("HashAggregate") && s.contains("partial")),
      "no cartesian/nested-loop product (hash-keyed joins only)" ->
        (s => !s.contains("CartesianProduct")))

    // --- delta near-dup (managed variant — the plain op seals its result
    // behind a checkpoint): batch-only probe side, blocked equi-join,
    // keyed verify ---
    {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val m = graft.ops.DeltaDedup.minhashPairsDeltaManaged(
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        graft.ops.Dedup.MinHashConfig(jaccardThreshold = 0.5))
      audit("q_neardup_delta", m.pairs, execute = true)(
        "no cartesian/nested-loop product (band-bucket equi-join only)" ->
          (s => !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")),
        "verify joins keyed (SortMergeJoin or hash)" ->
          (s => s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
            s.contains("BroadcastHashJoin")))
      m.free()
    }

    // --- triangle enumeration: wedge-close via keyed equi-joins only —
    // a cartesian or nested-loop anywhere means the canonical-order
    // blocking failed and the plan is enumerating O(V^2) pairs ---
    audit("q_triangles", SparkEntry.queries("q_triangles")(spark, dir),
      execute = true)(
      "no cartesian/nested-loop product (wedge equi-joins only)" ->
        (s => !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      "closure probe is a semi-join (no triangle-row materialization before filter)" ->
        (s => s.contains("LeftSemi")))

    // --- embedding near-dup: first-collision dedup means NO distinct
    // aggregate between the bucket join and the verify joins ---
    audit("q_embed_neardup", SparkEntry.queries("q_embed_neardup")(spark, dir),
      execute = true)(
      "no cartesian product (bucket-blocked equi-join)" ->
        (s => !s.contains("CartesianProduct")),
      "no pair-distinct aggregate (first-collision dedup inside the bucket kernel)" ->
        (s => !s.split("Initial Plan")(0).contains("HashAggregate")))

    // --- SemDeDup: the k-means clustering IS the blocking — the pair
    // kernel is a cluster-keyed flatMapGroups and every downstream join is
    // keyed, so a cartesian/nested-loop anywhere means the blocking leaked;
    // the corpus side of the decision join must stay an id-only scan (the
    // embedding arrays ride only the one clustering shuffle) ---
    audit("q_semdedup", SparkEntry.queries("q_semdedup")(spark, dir),
      execute = true)(
      "no cartesian/nested-loop product (cluster-keyed kernel + keyed joins)" ->
        (s => !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      "decision-join corpus side is an id-only pruned scan (no embedding col)" ->
        (s => s.contains("struct<vec_id:bigint>")))

    // --- shard packing (two-pass prefix sum): the offsets side must ride a
    // broadcast (it is O(partitions) rows), never a shuffled join; and the
    // running sum is ONE window node over the partition-id key ---
    {
      // audit the pre-seal plan: packByBudget checkpoints its output, so
      // audit the managed variant's pass-2 frame (what actually executes)
      val m = graft.ops.Sharding.packByBudgetManaged(
        spark.read.parquet(s"$dir/documents.parquet"), budget = 8000L)
      val df = m.pairs
      audit("q_pack_shards_pass2", df, execute = true)(
        "offsets joined via BroadcastHashJoin (O(partitions) side)" ->
          (s => s.contains("BroadcastHashJoin")),
        "single Window node for the running sum" ->
          (s => s.split("Initial Plan")(0).split("Window \\(").length == 2),
        "no cartesian/nested-loop product" ->
          (s => !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")))
      m.free()
    }

    // --- repetition stats: map-only typed-kernel projection — the ONLY
    // acceptable exchange is the output ordering (same posture as
    // q_stratified); and never a python/interpreted-HOF boundary ---
    audit("q_repetition", SparkEntry.queries("q_repetition")(spark, dir),
      execute = true)(
      "no shuffle except the output sort (one Exchange at most)" ->
        (s => s.split("Initial Plan")(0).split("Exchange").length <= 2),
      "no lambda higher-order functions (typed kernel, not HOFs)" ->
        (s => !s.toLowerCase.contains("lambdafunction")))

    // --- as-of join: the union+window formulation must produce NO join
    // node at all — one hash exchange on the key, one Window pass ---
    audit("q_asof_join", SparkEntry.queries("q_asof_join")(spark, dir),
      execute = true)(
      "zero join nodes (union + single-window as-of)" ->
        (s => !s.split("Initial Plan")(0).contains("Join")),
      "single Window node carries the as-of pick" ->
        (s => s.split("Initial Plan")(0).split("Window \\(").length == 2))

    // --- range join: bucketized to a keyed EQUI-join — a nested-loop or
    // cartesian means the non-equi range predicate leaked into the join ---
    audit("q_range_join", SparkEntry.queries("q_range_join")(spark, dir),
      execute = true)(
      "no cartesian/nested-loop product (bucket equi-join only)" ->
        (s => !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      "keyed join with the residual range filter applied post-join" ->
        (s => (s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
          s.contains("BroadcastHashJoin"))))

    // --- contamination (managed variant — the plain op seals behind a
    // checkpoint): benchmark hash set broadcast under the size gate,
    // train side joins on 8-byte fingerprints, per-doc count partial ---
    {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val m = graft.ops.Contamination.flagContaminatedManaged(
        docs.filter(pmod(col("doc_id"), lit(25)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(25)) === 0), shingleN = 4)
      audit("q_contamination", m.pairs, execute = true)(
        "benchmark probe broadcast (size gate passed at this scale)" ->
          (s => s.contains("BroadcastHashJoin")),
        "no cartesian/nested-loop product" ->
          (s => !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")),
        "per-doc hit count is a partial hash aggregate" ->
          (s => s.contains("HashAggregate") && s.contains("partial")))
      m.free()
    }

    // --- DSIR importance weights: the <=B-row log-ratio frame is broadcast
    // into the token scan (the corpus NEVER shuffles for the join; the one
    // shuffle is the per-doc aggregation), totals fold in as a 1-row NLJ ---
    audit("q_dsir_weights", SparkEntry.queries("q_dsir_weights")(spark, dir),
      execute = true)(
      "bucket log-ratios broadcast into the token scan" ->
        (s => s.contains("BroadcastHashJoin")),
      "no cartesian; the only nested-loop is the 1-row totals fold" ->
        (s => !s.contains("CartesianProduct") &&
          s.split("Initial Plan")(0).split("BroadcastNestedLoopJoin").length <= 2),
      "per-doc score is a partial hash aggregate" ->
        (s => s.contains("HashAggregate") && s.contains("partial")),
      "no lambda higher-order functions in the token scan" ->
        (s => !s.toLowerCase.contains("lambdafunction")))

    audit("q_dsir_resample", SparkEntry.queries("q_dsir_resample")(spark, dir),
      execute = true)(
      "Gumbel top-k is TakeOrderedAndProject, never a global sort" ->
        (s => s.contains("TakeOrderedAndProject")))

    // --- duplicate-span detection (managed variant — the plain op seals
    // behind a checkpoint): measured dup-window set broadcast under the
    // gate, span merge is ONE window + doc-partitioned aggs, fingerprints
    // (8 bytes) ride the shuffle -- never window strings ---
    {
      val m = graft.ops.DupSpans.dupSpanStatsManaged(
        spark.read.parquet(s"$dir/documents.parquet"), windowW = 8)
      audit("q_dup_spans", m.pairs, execute = true)(
      "duplicated-window set broadcast into the position stream" ->
        (s => s.contains("BroadcastHashJoin")),
      "no cartesian / nested-loop products" ->
        (s => !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      // lag-flag + running-island-sum are two Window nodes (different
      // frames), but they must PIPELINE over a single (doc, pos) Sort —
      // no re-sort, no re-shuffle between them
      "two pipelined Windows over ONE sort (gaps-and-islands merge)" ->
        (s => {
          // note: formatted AQE output puts node-detail headers AFTER the
          // Initial Plan section, so assert on the final-plan TREE slice
          val sec = s.split("Initial Plan")(0)
          val ws = "Window \\(\\d+\\)".r.findAllMatchIn(sec).map(_.start).toList
          ws.size == 2 && {
            val between = sec.substring(ws(0), ws(1))
            !between.contains("Exchange") && !between.contains("Sort (") &&
              !between.contains("ShuffleRead")
          }
        }),
      "partial hash aggregates (window counts + span rollups)" ->
        (s => s.contains("HashAggregate") && s.contains("partial")),
      "no lambda higher-order functions" ->
        (s => !s.toLowerCase.contains("lambdafunction")))
      m.free()
    }

    // --- brute-force ANN (r5 partial-top-k rewrite): the Q x N scored
    // cross product must NEVER materialize as rows — per-partition bounded
    // heaps emit Q x partitions x k candidates, and only that tiny union
    // takes the global window rank ---
    {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val qs = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      audit("q_knn", graft.ops.Similarity.bruteForceTopK(emb, qs, 10),
          execute = true)(
      "partial top-k kernel (MapPartitions), no cross join" ->
        (s => s.contains("MapPartitions") && !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      "exactly one Window (global rank over the candidate union only)" ->
        (s => {
          val sec = s.split("Initial Plan")(0)
          "Window \\(\\d+\\)".r.findAllMatchIn(sec).size == 1
        }),
      "no lambda higher-order functions" ->
        (s => !s.toLowerCase.contains("lambdafunction")))
    }

    // --- int8 quantization: the encode is a MAP-ONLY typed kernel (the
    // O(dim) fitted params ride the closure, never a join) and the
    // quantized kNN keeps q_knn's partial-top-k shape over the
    // dequantized corpus ---
    {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val p = graft.ops.Quantize.fit(emb)
      audit("q_quantize", graft.ops.Quantize.encode(emb, p),
          execute = true)(
        "map-only encode: zero exchanges" -> (s => !s.contains("Exchange")),
        "typed kernel, no lambda higher-order functions" ->
          (s => s.contains("MapPartitions") &&
            !s.toLowerCase.contains("lambdafunction")))
      val qs = emb
        .filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.lit(50)) === 0)
        .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
          org.apache.spark.sql.functions.col("embedding").as("q_embedding"))
      audit("q_knn_q8", graft.ops.Quantize.knnTopK(emb, qs, 10),
          execute = true)(
        "partial top-k kernel over the dequantized corpus, no cross join" ->
          (s => s.contains("MapPartitions") && !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")))
    }

    // --- bigram-LM perplexity: the count tables (O(target tokens) rows)
    // must broadcast into the raw-corpus bigram scan — the corpus NEVER
    // shuffles to meet them — and the per-doc score is a partial+final
    // hash aggregate (the DSIR plan shape with bigram context) ---
    {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val m = graft.ops.Perplexity.lmScoreManaged(
        docs.filter(col("doc_id") % 25 =!= 0),
        docs.filter(col("doc_id") % 25 === 0))
      audit("q_lm_ppl", m.pairs, execute = true)(
      "count tables broadcast into the bigram scan" ->
        (s => s.contains("BroadcastHashJoin")),
      "no cartesian / nested-loop products" ->
        (s => !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      "partial hash aggregate for the per-doc score" ->
        (s => s.contains("HashAggregate") && s.contains("partial")),
      "no lambda higher-order functions" ->
        (s => !s.toLowerCase.contains("lambdafunction")))
      m.free()
    }

    // --- percentile rank-buckets (two-pass global rank): the offsets side
    // must ride a broadcast, the row_number window must key by partition id
    // — NEVER the SinglePartition a bare row_number-over-order-by plans ---
    {
      val m = graft.ops.Percentile.rankBucketsManaged(
        spark.read.parquet(s"$dir/documents.parquet"), 3, "n_chars")
      audit("q_ppl_buckets_pass2", m.pairs, execute = true)(
        "offsets joined via BroadcastHashJoin (O(partitions) side)" ->
          (s => s.contains("BroadcastHashJoin")),
        "single Window node for the per-partition row_number" ->
          (s => s.split("Initial Plan")(0).split("Window \\(").length == 2),
        "no SinglePartition exchange (the global-rank scale trap)" ->
          (s => !s.contains("SinglePartition")),
        "no cartesian/nested-loop product" ->
          (s => !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")))
      m.free()
    }

    // --- per-group rank-buckets: like the global variant but the offsets
    // frame is derived distributedly (windows over the tiny per-(pid,
    // group) counts aggregate — zero driver collects) ---
    {
      val m = graft.ops.Percentile.rankBucketsByManaged(
        spark.read.parquet(s"$dir/documents.parquet"), 4, "n_chars",
        "doc_id", "lang")
      audit("q_lang_buckets", m.pairs, execute = true)(
        "offsets joined via BroadcastHashJoin (O(partitions+groups) side)" ->
          (s => s.contains("BroadcastHashJoin")),
        "no SinglePartition exchange (the global-rank scale trap)" ->
          (s => !s.contains("SinglePartition")),
        "no cartesian/nested-loop product" ->
          (s => !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")))
      m.free()
    }

    // --- BPE pair counts: the corpus collapses to the distinct-word table
    // via a partial hash aggregate (map-side combined — the one
    // corpus-scale scan), the top-50 is a TakeOrderedAndProject (never a
    // global sort), and the word explode is relational (no lambda HOFs) ---
    audit("q_bpe_pairs", graft.ops.Bpe.pairCounts(
          spark.read.parquet(s"$dir/documents.parquet"))
        .orderBy(org.apache.spark.sql.functions.col("cnt").desc,
          org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"))
        .limit(50), execute = true)(
      "word table via partial HashAggregate" ->
        (s => s.contains("HashAggregate") && s.contains("partial_count")),
      "top-50 is TakeOrderedAndProject, never a global sort" ->
        (s => s.contains("TakeOrderedAndProject")),
      "no lambda higher-order functions" ->
        (s => !s.toLowerCase.contains("lambdafunction")))

    // --- token-window chunking: a map-only typed kernel — no exchanges at
    // all (the query-level output sort is added by the driver query, not
    // the op), no lambda HOFs ---
    audit("q_chunk", graft.ops.TextStats.chunk(
        spark.read.parquet(s"$dir/documents.parquet"), 40, 30),
        execute = true)(
      "map-only: zero exchanges" -> (s => !s.contains("Exchange")),
      "typed kernel, no lambda higher-order functions" ->
        (s => s.contains("MapPartitions") &&
          !s.toLowerCase.contains("lambdafunction")))

    // --- source mixing: the budgeted-source filter must reach the parquet
    // scan; the per-source offsets and the budget table both broadcast
    // (O(partitions+sources) and O(sources) rows); never a per-source
    // SinglePartition sort ---
    {
      val m = graft.ops.Mixing.mixByBudgetManaged(
        spark.read.parquet(s"$dir/documents.parquet"),
        Map("src0" -> 4000L, "src1" -> 2500L))
      audit("q_mix", m.pairs, execute = true)(
        "offsets + budgets joined via BroadcastHashJoin" ->
          (s => s.contains("BroadcastHashJoin")),
        "no SinglePartition exchange (prefix sum stays distributed)" ->
          (s => !s.contains("SinglePartition")),
        "no cartesian/nested-loop product" ->
          (s => !s.contains("CartesianProduct") &&
            !s.contains("BroadcastNestedLoopJoin")))
      m.free()
    }

    // --- NB quality classifier: the two per-class count tables (O(vocab)
    // rows) must broadcast into the raw-corpus token scan — the corpus
    // NEVER shuffles to meet them — and the per-doc score is a
    // partial+final hash aggregate (the q_lm_ppl plan shape, two tables) ---
    {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val m = graft.ops.QualityClassifier.nbScoreManaged(
        docs.filter(col("doc_id") % 25 =!= 0 && col("doc_id") % 25 =!= 1),
        docs.filter(col("doc_id") % 25 === 0),
        docs.filter(col("doc_id") % 25 === 1))
      audit("q_nb_quality", m.pairs, execute = true)(
      "count tables broadcast into the token scan" ->
        (s => s.contains("BroadcastHashJoin")),
      "no cartesian / nested-loop products" ->
        (s => !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      "partial hash aggregate for the per-doc score" ->
        (s => s.contains("HashAggregate") && s.contains("partial")),
      "no lambda higher-order functions" ->
        (s => !s.toLowerCase.contains("lambdafunction")))
      m.free()
    }

    // --- composed curation decision table: the near-dup and contamination
    // internals are SEALED (audited separately above), so this plan must be
    // pure map-side signal computation + ONE window (the exact-dup keep)
    // + doc-keyed equi-joins — nothing else ---
    {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      audit("q_curate", graft.ops.Curate.curate(
          docs.filter(col("doc_id") % 25 =!= 0),
          docs.filter(col("doc_id") % 25 === 0)), execute = true)(
      "no cartesian / nested-loop products" ->
        (s => !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      "exactly one Window (the exact-dup min-id keep)" ->
        (s => {
          val sec = s.split("Initial Plan")(0)
          "Window \\(\\d+\\)".r.findAllMatchIn(sec).size == 1
        }),
      "no lambda higher-order functions" ->
        (s => !s.toLowerCase.contains("lambdafunction")),
      "filters pushed into the parquet scan" ->
        (s => s.contains("PushedFilters: [")))
    }

    // --- duplicate-span REMOVAL (managed variant): same span core, plus a
    // doc-keyed span-collect and the removal kernel join — must stay
    // equi-join-shaped with the dup-window set broadcast under the gate ---
    {
      val m = graft.ops.DupSpans.removeDupSpansManaged(
        spark.read.parquet(s"$dir/documents.parquet"), windowW = 8)
      audit("q_dup_spans_clean", m.pairs, execute = true)(
      "duplicated-window set broadcast into the position stream" ->
        (s => s.contains("BroadcastHashJoin")),
      "no cartesian / nested-loop products" ->
        (s => !s.contains("CartesianProduct") &&
          !s.contains("BroadcastNestedLoopJoin")),
      "two pipelined Windows over ONE sort (gaps-and-islands merge)" ->
        (s => {
          val sec = s.split("Initial Plan")(0)
          val ws = "Window \\(\\d+\\)".r.findAllMatchIn(sec).map(_.start).toList
          ws.size == 2 && {
            val between = sec.substring(ws(0), ws(1))
            !between.contains("Exchange") && !between.contains("Sort (") &&
              !between.contains("ShuffleRead")
          }
        }),
      "span collect is a doc-keyed objectHashAggregate (never a global sort)" ->
        (s => s.contains("ObjectHashAggregate")),
      "no lambda higher-order functions" ->
        (s => !s.toLowerCase.contains("lambdafunction")))
      m.free()
    }

    println(s"\nTOTAL CHECK FAILURES: $failures")
    spark.stop()
  }
}
