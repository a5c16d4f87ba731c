package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** graft.DataMain is the CLI promise for the training-data operator suite
  * ("run dedup/split/ANN/text-stats on MY parquet table") — every op must
  * equal the library call it wraps. Driven in-process: DataMain joins the
  * live test session and must not stop it. */
class DataMainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def cli(args: String*): String = {
    val out = Files.createTempDirectory("graft-datamain").toString + "/out"
    DataMain.main((args ++ Seq("--out", out)).toArray)
    assert(!spark.sparkContext.isStopped) // session survived
    out
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(s"concat_ws('|', ${cols.map(c => s"coalesce(cast(`$c` as string), '')").mkString(", ")})")
      .collect().map(_.getString(0)).toSet
  }

  private def assertCliEqualsLibrary(outDir: String,
      lib: org.apache.spark.sql.DataFrame): Unit = {
    val got = spark.read.parquet(outDir)
    assert(got.columns.sorted.sameElements(lib.columns.sorted))
    assert(rows(got) == rows(lib))
  }

  test("dedup-exact CLI == Dedup.exact") {
    val out = cli("--op", "dedup-exact", "--in", s"$sf/documents.parquet")
    assertCliEqualsLibrary(out,
      graft.ops.Dedup.exact(spark.read.parquet(s"$sf/documents.parquet")))
  }

  test("ngram-pairs CLI == Dedup.ngramJaccardPairs (threshold flag honored)") {
    val out = cli("--op", "ngram-pairs", "--in", s"$sf/documents.parquet",
      "--threshold", "0.5")
    assertCliEqualsLibrary(out, graft.ops.Dedup.ngramJaccardPairs(
      spark.read.parquet(s"$sf/documents.parquet"), 3, 0.5))
  }

  test("doc-groups CLI == dedupGroups(ngramJaccardPairs)") {
    val out = cli("--op", "doc-groups", "--in", s"$sf/documents.parquet")
    assertCliEqualsLibrary(out, graft.ops.Dedup.dedupGroups(
      graft.ops.Dedup.ngramJaccardPairs(
        spark.read.parquet(s"$sf/documents.parquet"), 3, 0.5)))
  }

  test("split + stratified CLI == Sampling (fraction map parsed)") {
    val out = cli("--op", "split", "--in", s"$sf/documents.parquet",
      "--train-pct", "70", "--val-pct", "20")
    assertCliEqualsLibrary(out, graft.ops.Sampling.assignSplit(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", 70, 20))

    val out2 = cli("--op", "stratified", "--in", s"$sf/documents.parquet",
      "--strata-col", "source", "--fractions", "src0=0.9,src1=0.5",
      "--default-fraction", "0.2")
    assertCliEqualsLibrary(out2, graft.ops.Sampling.stratifiedSample(
      spark.read.parquet(s"$sf/documents.parquet"), "source", "doc_id",
      Map("src0" -> 0.9, "src1" -> 0.5), 0.2))
  }

  test("sessionize CLI == Sessionize.sessions (gap flag honored)") {
    val out = cli("--op", "sessionize", "--in", s"$sf/events.parquet",
      "--gap-ms", "600000")
    assertCliEqualsLibrary(out, graft.ops.Sessionize.sessions(
      spark.read.parquet(s"$sf/events.parquet"), 600000L))
  }

  test("knn CLI (default query derivation) == bruteForceTopK") {
    import org.apache.spark.sql.functions._
    val out = cli("--op", "knn", "--in", s"$sf/embeddings.parquet", "--k", "5")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    assertCliEqualsLibrary(out, graft.ops.Similarity.bruteForceTopK(emb, q, 5))
  }

  test("quantize + knn-q8 CLI == Quantize library calls") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = graft.ops.Quantize.fit(emb)
    assertCliEqualsLibrary(
      cli("--op", "quantize", "--in", s"$sf/embeddings.parquet"),
      graft.ops.Quantize.encode(emb, p))
    val q = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    assertCliEqualsLibrary(
      cli("--op", "knn-q8", "--in", s"$sf/embeddings.parquet", "--k", "5"),
      graft.ops.Quantize.knnTopK(emb, q, 5))
    // persisted index round trip through the CLI (--index required)
    val idx = java.nio.file.Files.createTempDirectory("graft-q8-cli").toString + "/idx"
    cli("--op", "q8-build", "--in", s"$sf/embeddings.parquet", "--index", idx)
    assertCliEqualsLibrary(
      cli("--op", "knn-q8-indexed", "--in", s"$sf/embeddings.parquet",
        "--index", idx, "--k", "5"),
      graft.ops.Quantize.knnTopK(emb, q, 5))
    intercept[IllegalArgumentException](graft.DataMain.run(spark, "q8-build",
      s"$sf/embeddings.parquet", Map.empty))
  }

  test("token-stats and fingerprint CLI == TextStats/TextHash") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assertCliEqualsLibrary(
      cli("--op", "token-stats", "--in", s"$sf/documents.parquet"),
      graft.ops.TextStats.tokenStats(docs))
    import org.apache.spark.sql.functions.col
    assertCliEqualsLibrary(
      cli("--op", "fingerprint", "--in", s"$sf/documents.parquet"),
      docs.select(col("doc_id"),
        graft.functions.TextHash.fingerprint64(col("text")).as("fp"),
        graft.functions.TextHash.simhash64(col("text")).as("sh")))
  }

  test("semdedup CLI == SemDedup.decisions (threshold + assign flags honored)") {
    val out = cli("--op", "semdedup", "--in", s"$sf/embeddings.parquet",
      "--n-lists", "4", "--threshold", "0.5", "--assign", "2")
    assertCliEqualsLibrary(out, graft.ops.SemDedup.decisions(
      spark.read.parquet(s"$sf/embeddings.parquet"),
      graft.ops.SemDedup.Config(nLists = 4, kmeansIters = 3, assign = 2,
        threshold = 0.5)))
  }

  test("dedup-delta / neardup-delta CLI == DeltaDedup (corpus flag wired)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = Files.createTempDirectory("graft-delta-in").toString
    docs.filter(pmod(col("doc_id"), lit(10)) === 0).write.parquet(s"$base/batch")
    docs.filter(pmod(col("doc_id"), lit(10)) =!= 0).write.parquet(s"$base/corpus")
    val batch = spark.read.parquet(s"$base/batch")
    val corpus = spark.read.parquet(s"$base/corpus")

    assertCliEqualsLibrary(
      cli("--op", "dedup-delta", "--in", s"$base/batch", "--corpus", s"$base/corpus"),
      graft.ops.DeltaDedup.exactClassify(batch, corpus))
    assertCliEqualsLibrary(
      cli("--op", "neardup-delta", "--in", s"$base/batch",
        "--corpus", s"$base/corpus", "--threshold", "0.5"),
      graft.ops.DeltaDedup.minhashPairsDelta(batch, corpus,
        graft.ops.Dedup.MinHashConfig(jaccardThreshold = 0.5)))
    // a delta op without --corpus must fail loudly
    val e = intercept[IllegalArgumentException] {
      DataMain.run(spark, "dedup-delta", s"$base/batch", Map.empty)
    }
    assert(e.getMessage.contains("--corpus"))
  }

  test("dedup-ingest CLI == DeltaDedup.ingest (state folded across batches)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = Files.createTempDirectory("graft-ingest-in").toString
    docs.filter(pmod(col("doc_id"), lit(2)) === 0).write.parquet(s"$base/b0")
    // batch 2: the odd docs PLUS re-submissions of 20 batch-1 texts under
    // fresh ids (the fixture has no exact dups of its own) — these must
    // come back classified 'corpus'
    docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)
      .unionByName(docs.filter(pmod(col("doc_id"), lit(2)) === 0).limit(20)
        .withColumn("doc_id", col("doc_id") + 1000000L))
      .write.parquet(s"$base/b1")

    // CLI drives one state dir, the library the other, same batch order
    val cliState = s"$base/state-cli"
    val libState = s"$base/state-lib"
    cli("--op", "dedup-ingest", "--in", s"$base/b0", "--state", cliState)
    val out1 = cli("--op", "dedup-ingest", "--in", s"$base/b1",
      "--state", cliState, "--emit", "classified")
    graft.ops.DeltaDedup.ingest(spark, libState, spark.read.parquet(s"$base/b0"))
    val lib1 = graft.ops.DeltaDedup.ingest(spark, libState,
      spark.read.parquet(s"$base/b1"))
    assertCliEqualsLibrary(out1, lib1.classified)
    // batch-2 classifications must SEE batch-1 state (some 'corpus' rows)
    assert(spark.read.parquet(out1)
      .filter(col("dup_kind") === "corpus").count() > 0)
    // --emit verified without --partner-texts fails loudly
    val e = intercept[IllegalArgumentException] {
      DataMain.run(spark, "dedup-ingest", s"$base/b1",
        Map("state" -> s"$base/state-x", "emit" -> "verified"))
    }
    assert(e.getMessage.contains("--partner-texts"))
  }

  test("ivf-build / ivf-append / knn-ivf-indexed CLI == Similarity index calls") {
    import org.apache.spark.sql.functions._
    val emb = s"$sf/embeddings.parquet"
    val idx = Files.createTempDirectory("graft-datamain-ivf").toString + "/idx"
    val cfg = graft.ops.Similarity.IvfConfig(nLists = 8, kmeansIters = 2, nProbe = 8)

    // build on 2/3 of the vectors, append the remaining 1/3 O(delta)
    val full = spark.read.parquet(emb)
    val trainDir = Files.createTempDirectory("graft-datamain-ivf").toString + "/train"
    val batchDir = Files.createTempDirectory("graft-datamain-ivf").toString + "/batch"
    full.filter(pmod(col("vec_id"), lit(3)) =!= 0).write.parquet(trainDir)
    full.filter(pmod(col("vec_id"), lit(3)) === 0).write.parquet(batchDir)
    val built = cli("--op", "ivf-build", "--in", trainDir, "--index", idx,
      "--n-lists", "8", "--kmeans-iters", "2")
    cli("--op", "ivf-append", "--in", batchDir, "--index", idx,
      "--n-lists", "8", "--kmeans-iters", "2")
    // occupancy summary covers every vector exactly once
    assert(spark.read.parquet(built).agg(sum(col("n_vectors"))).head().getLong(0)
      < full.count()) // build summary predates the append
    // indexed query over the appended index == library call on the same index
    val out = cli("--op", "knn-ivf-indexed", "--in", emb, "--index", idx,
      "--n-lists", "8", "--kmeans-iters", "2", "--n-probe", "8", "--k", "5")
    assertCliEqualsLibrary(out, graft.ops.Similarity.ivfTopKIndexed(
      full, full.filter(pmod(col("vec_id"), lit(50)) === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding")),
      5, cfg, idx))
  }

  test("asof-join / range-join CLI == Temporal library calls") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val tmp = Files.createTempDirectory("graft-temporal-cli").toString
    val probes = ev.filter(col("event_id") % 3 =!= 0)
      .select(col("event_id"), col("user_id"), col("ts"))
    val states = ev.filter(col("event_id") % 3 === 0)
      .select(col("user_id"), col("ts"), col("value").as("state_value"),
        col("event_id").as("state_event"))
    probes.write.parquet(s"$tmp/probes")
    states.write.parquet(s"$tmp/states")
    val out = cli("--op", "asof-join", "--in", s"$tmp/probes",
      "--right", s"$tmp/states", "--tie-col", "state_event",
      "--payload", "state_value,state_event")
    assertCliEqualsLibrary(out, graft.ops.Temporal.asofJoin(probes, states,
      Seq("user_id"), "ts", "state_event", Seq("state_value", "state_event")))

    val intervals = ev.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("interval_id"), col("user_id"),
        col("ts").as("lo"), (col("ts") + expr("INTERVAL 24 HOURS")).as("hi"))
    intervals.write.parquet(s"$tmp/intervals")
    val out2 = cli("--op", "range-join", "--in", s"$tmp/probes",
      "--intervals", s"$tmp/intervals", "--bucket-ms", "86400000")
    assertCliEqualsLibrary(out2, graft.ops.Temporal.rangeJoin(probes, intervals,
      Seq("user_id"), "ts", "lo", "hi", 86400000L))
  }

  test("repetition CLI == TextStats.repetitionStats") {
    val out = cli("--op", "repetition", "--in", s"$sf/documents.parquet")
    assertCliEqualsLibrary(out, graft.ops.TextStats.repetitionStats(
      spark.read.parquet(s"$sf/documents.parquet")))
  }

  test("pack-shards CLI == Sharding.packByBudget (budget flag honored)") {
    val out = cli("--op", "pack-shards", "--in", s"$sf/documents.parquet",
      "--budget", "2000")
    assertCliEqualsLibrary(out, graft.ops.Sharding.packByBudget(
      spark.read.parquet(s"$sf/documents.parquet"), 2000L))
  }

  test("contamination CLI == Contamination.flagContaminated") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmp = Files.createTempDirectory("graft-contam-cli").toString
    docs.filter(col("doc_id") % 25 =!= 0).write.parquet(s"$tmp/train")
    docs.filter(col("doc_id") % 25 === 0).write.parquet(s"$tmp/bench")
    val out = cli("--op", "contamination", "--in", s"$tmp/train",
      "--benchmark", s"$tmp/bench", "--shingle-n", "4")
    assertCliEqualsLibrary(out, graft.ops.Contamination.flagContaminated(
      docs.filter(col("doc_id") % 25 =!= 0), docs.filter(col("doc_id") % 25 === 0),
      shingleN = 4))
  }

  test("dup-spans CLI == DupSpans library call") {
    val out = cli("--op", "dup-spans", "--in", s"$sf/documents.parquet",
      "--window-w", "6", "--min-docs", "2")
    assertCliEqualsLibrary(out, graft.ops.DupSpans.dupSpanStats(
      spark.read.parquet(s"$sf/documents.parquet"), windowW = 6))
  }

  test("dup-spans-clean CLI == DupSpans.removeDupSpans library call") {
    val out = cli("--op", "dup-spans-clean", "--in", s"$sf/documents.parquet",
      "--window-w", "6")
    assertCliEqualsLibrary(out, graft.ops.DupSpans.removeDupSpans(
      spark.read.parquet(s"$sf/documents.parquet"), windowW = 6))
  }

  test("curate CLI == Curate library call (benchmark flag required)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = cli("--op", "curate", "--in", s"$sf/documents.parquet",
      "--benchmark", s"$sf/documents.parquet")
    assertCliEqualsLibrary(out, graft.ops.Curate.curate(docs, docs))
    intercept[IllegalArgumentException](graft.DataMain.run(spark, "curate",
      s"$sf/documents.parquet", Map.empty))
  }

  test("lm-score CLI == Perplexity library call (target flag required)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = cli("--op", "lm-score", "--in", s"$sf/documents.parquet",
      "--target", s"$sf/documents.parquet", "--add-k", "0.5")
    assertCliEqualsLibrary(out, graft.ops.Perplexity.lmScore(docs, docs, 0.5))
    intercept[IllegalArgumentException](graft.DataMain.run(spark, "lm-score",
      s"$sf/documents.parquet", Map.empty))
  }

  test("nb-quality CLI == QualityClassifier library call (both class flags required)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmp = Files.createTempDirectory("graft-nbq-cli").toString
    docs.filter(col("doc_id") % 2 === 0).write.parquet(s"$tmp/pos")
    docs.filter(col("doc_id") % 2 === 1).write.parquet(s"$tmp/neg")
    val out = cli("--op", "nb-quality", "--in", s"$sf/documents.parquet",
      "--positive", s"$tmp/pos", "--negative", s"$tmp/neg", "--add-k", "0.5")
    assertCliEqualsLibrary(out, graft.ops.QualityClassifier.nbScore(docs,
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), 0.5))
    intercept[IllegalArgumentException](graft.DataMain.run(spark, "nb-quality",
      s"$sf/documents.parquet", Map("positive" -> s"$tmp/pos")))
  }

  test("rank-buckets CLI == Percentile library call") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = cli("--op", "rank-buckets", "--in", s"$sf/documents.parquet",
      "--score-col", "n_chars", "--k", "4")
    assertCliEqualsLibrary(out,
      graft.ops.Percentile.rankBuckets(docs, 4, "n_chars"))
    val outBy = cli("--op", "rank-buckets", "--in", s"$sf/documents.parquet",
      "--score-col", "n_chars", "--k", "4", "--by-col", "lang")
    assertCliEqualsLibrary(outBy,
      graft.ops.Percentile.rankBucketsBy(docs, 4, "n_chars", "doc_id", "lang"))
  }

  test("mix CLI == Mixing library call (budgets flag required)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = cli("--op", "mix", "--in", s"$sf/documents.parquet",
      "--budgets", "src0=4000,src1=2500")
    assertCliEqualsLibrary(out,
      graft.ops.Mixing.mixByBudget(docs, Map("src0" -> 4000L, "src1" -> 2500L)))
    intercept[IllegalArgumentException](graft.DataMain.run(spark, "mix",
      s"$sf/documents.parquet", Map.empty))
  }

  test("chunk CLI == TextStats.chunk (window/stride flags honored)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assertCliEqualsLibrary(
      cli("--op", "chunk", "--in", s"$sf/documents.parquet",
        "--window-w", "20", "--stride", "15"),
      graft.ops.TextStats.chunk(docs, 20, 15))
  }

  test("bpe-pairs/learn/apply CLI == Bpe library calls (merges-table required)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assertCliEqualsLibrary(
      cli("--op", "bpe-pairs", "--in", s"$sf/documents.parquet"),
      graft.ops.Bpe.pairCounts(docs))
    val merges = graft.ops.Bpe.learnMerges(docs, 5)
    val learned = cli("--op", "bpe-learn", "--in", s"$sf/documents.parquet",
      "--merges", "5")
    assertCliEqualsLibrary(learned,
      spark.createDataFrame(merges).toDF("rank", "a", "b"))
    assertCliEqualsLibrary(
      cli("--op", "bpe-apply", "--in", s"$sf/documents.parquet",
        "--merges-table", learned),
      graft.ops.Bpe.applyMerges(docs, merges))
    intercept[IllegalArgumentException](graft.DataMain.run(spark, "bpe-apply",
      s"$sf/documents.parquet", Map.empty))
  }

  test("dsir-weights + dsir-sample CLI == Importance (target flag required)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tmp = Files.createTempDirectory("graft-dsir-cli").toString
    docs.filter(col("source") === "src0").write.parquet(s"$tmp/target")
    docs.filter(col("source") =!= "src0").write.parquet(s"$tmp/raw")
    val cfg = graft.ops.Importance.DsirConfig(buckets = 128)
    val out = cli("--op", "dsir-weights", "--in", s"$tmp/raw",
      "--target", s"$tmp/target", "--buckets", "128")
    assertCliEqualsLibrary(out, graft.ops.Importance.dsirWeights(
      spark.read.parquet(s"$tmp/raw"), spark.read.parquet(s"$tmp/target"), cfg))
    val out2 = cli("--op", "dsir-sample", "--in", s"$tmp/raw",
      "--target", s"$tmp/target", "--buckets", "128", "--k", "20",
      "--temperature", "0.5")
    assertCliEqualsLibrary(out2, graft.ops.Importance.resampleTopK(
      spark.read.parquet(s"$tmp/raw"), spark.read.parquet(s"$tmp/target"),
      20, 0.5, cfg))
    val e = intercept[IllegalArgumentException] {
      DataMain.run(spark, "dsir-weights", s"$tmp/raw", Map.empty)
    }
    assert(e.getMessage.contains("--target"))
  }

  test("unknown op and malformed fractions fail loudly, not silently") {
    val e = intercept[IllegalArgumentException] {
      DataMain.run(spark, "no-such-op", s"$sf/documents.parquet", Map.empty)
    }
    assert(e.getMessage.contains("no-such-op"))
    val e2 = intercept[IllegalArgumentException] {
      DataMain.run(spark, "stratified", s"$sf/documents.parquet",
        Map("fractions" -> "oops"))
    }
    assert(e2.getMessage.contains("oops"))
  }
}
