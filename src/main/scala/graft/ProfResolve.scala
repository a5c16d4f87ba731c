package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the kg_resolve driver query (Incremental.run over
  * the resolve corpus + resolveDisjoint + final read) — VERDICT r5 item 7:
  * attribute the cost so intrinsic work is separable from regression.
  * Usage: scripts/run.sh ProfResolve [sfDir] [reps]
  */
object ProfResolve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () } // warm-up

    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val x = f
      println(f"[prof] $n%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); x
    }

    import graft.kg._
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val out = java.nio.file.Files.createTempDirectory("prof-resolve").toString
      val turns = time("fromTestdataResolve (lazy)") {
        Transcripts.fromTestdataResolve(spark, sfDir)
      }
      time("Incremental.run nBuckets=2") {
        Incremental.run(turns, Pipeline.emptyDict(spark), out, "resolve-run",
          nBuckets = 2, linkCfg = Link.Config(fuzzy = false), recordCounts = false)
      }
      time("resolveDisjoint (exact PPJoin)") {
        Incremental.resolveDisjoint(spark, out,
          Link.Config(fuzzy = true, exactSameAs = true, jaccardThreshold = 0.8,
            fuzzyTypes = Seq("Person")))
      }
      time("final readTable+orderBy+noop") {
        Materialize.readTable(spark, s"$out/edges").get
          .orderBy(Materialize.edgeKey.map(col): _*)
          .write.mode("overwrite").format("noop").save()
      }
      val m = Incremental.readMetrics(spark, out)
        .filter(col("stage") === "resolve").collect()
      m.foreach(r => println(s"       metric ${r.getString(3)} = ${r.getLong(4)}"))

      // manual decomposition of the discovery phase (full-rediscovery
      // shape, PRE-resolve key set — re-derive the unconverged names by
      // re-running the bucketed pipeline WITHOUT the resolver)
      val cfg2 = Link.Config(fuzzy = true, exactSameAs = true,
        jaccardThreshold = 0.8, fuzzyTypes = Seq("Person"))
      val out2 = java.nio.file.Files.createTempDirectory("prof-resolve2").toString
      Incremental.run(Transcripts.fromTestdataResolve(spark, sfDir),
        Pipeline.emptyDict(spark), out2, "resolve-run", nBuckets = 2,
        linkCfg = Link.Config(fuzzy = false), recordCounts = false)
      val nodes2 = Materialize.readTable(spark, s"$out2/nodes").get
      val flagged = time("  eligible distinct + checkpoint") {
        nodes2.filter(col("entity_type").isin(cfg2.fuzzyTypes: _*))
          .select(col("entity_type"), col("name").as("dict_key")).distinct()
          .withColumn("is_new", lit(true)).localCheckpoint(eager = true)
      }
      println(s"       eligible keys: ${flagged.count()}")
      // inner stages of buildCandidates, timed one materialization at a time
      locally {
        val shU = udf((s: String) => Link.shingles(s).toSeq)
        val items2 = flagged.select(col("entity_type").as("grp"),
          col("dict_key").as("id"), shU(col("dict_key")).as("toks"),
          col("is_new"))
        val (pairsPlan, ranked) = graft.ops.SimJoin.buildCandidates(
          items2, cfg2.jaccardThreshold, delta = true)
        // ranked checkpoint already materialized inside buildCandidates
        val t0 = System.nanoTime()
        val nMatched = pairsPlan.count()
        println(f"       join+agg pairs count: ${(System.nanoTime()-t0)/1e9}%.2f s ($nMatched pairs)")
        ranked.unpersist()
      }
      val items = flagged.select(col("entity_type").as("grp"),
        col("dict_key").as("id"),
        udf((s: String) => Link.shingles(s).toSeq).apply(col("dict_key")).as("toks"),
        col("is_new"))
      val cand = time("  SimJoin.candidatePairs (eager)") {
        graft.ops.SimJoin.candidatePairs(items, cfg2.jaccardThreshold,
          "prof.exact", delta = true)
      }
      println(s"       candidates: ${cand.count()}")
      val sameAs = time("  verify (sorted-merge) + count") {
        val (sa, _) = Link.fuzzySameAsManaged(flagged, cfg2, delta = true)
        val c = sa.localCheckpoint(eager = true)
        println(s"       sameAs pairs: ${c.count()}")
        c
      }
      time("  connectedComponents") {
        Canonicalize.connectedComponents(
          sameAs.select(col("entity_type"), col("key_a"), col("key_b"))).count()
      }
      cand.unpersist(); flagged.unpersist()
    }
    spark.stop()
  }
}
