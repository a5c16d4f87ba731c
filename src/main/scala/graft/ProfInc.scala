package graft

import org.apache.spark.sql.SparkSession

/** Phase breakdown of the kg_incremental / kg_streaming driver queries —
  * identifies the fixed per-batch MERGE overhead vs real pipeline work.
  * Usage: scripts/run.sh ProfInc [sfDir]
  */
object ProfInc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warm-up
    try SparkEntry.entry(spark).write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    // ---- kg_incremental decomposition ----
    val turns = time("fromTestdata + checkpoint") {
      graft.kg.Transcripts.fromTestdata(spark, sfDir).localCheckpoint(true)
    }
    val out = java.nio.file.Files.createTempDirectory("prof-inc").toString
    time("Incremental.run nBuckets=2 TOTAL") {
      graft.kg.Incremental.run(turns, graft.kg.Pipeline.emptyDict(spark), out,
        "prof", nBuckets = 2, linkCfg = graft.kg.Link.Config(fuzzy = false),
        recordCounts = false)
    }

    // manual replication of run()'s per-bucket steps, individually timed
    {
      import org.apache.spark.sql.functions._
      val out2 = java.nio.file.Files.createTempDirectory("prof-inc2").toString
      val dict = graft.kg.Pipeline.emptyDict(spark)
      (0 until 2).foreach { b =>
        val slice = turns.filter(pmod(hash(col("conv_id")), lit(2)) === b)
        val r = time(s"  bucket $b Pipeline.run") {
          graft.kg.Pipeline.run(slice, dict, graft.kg.Link.Config(fuzzy = false))
        }
        time(s"  bucket $b appendDelta edges") {
          graft.kg.Materialize.appendDelta(spark, s"$out2/edges", r.edges,
            graft.kg.Materialize.edgeKey, compactEvery = 8)
        }
        time(s"  bucket $b appendDelta nodes") {
          graft.kg.Materialize.appendDelta(spark, s"$out2/nodes", r.nodes,
            Seq("guid", "entity_type"), compactEvery = 8)
        }
        time(s"  bucket $b close") { r.close() }
      }
      time("  compact edges") { graft.kg.Materialize.compact(spark, s"$out2/edges") }
      time("  compact nodes") { graft.kg.Materialize.compact(spark, s"$out2/nodes") }
    }
    time("readTable+orderBy+noop") {
      graft.kg.Materialize.readTable(spark, s"$out/edges").get
        .orderBy(graft.kg.Materialize.edgeKey.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").format("noop").save()
    }

    // ---- kg_streaming decomposition ----
    val base = java.nio.file.Files.createTempDirectory("prof-stream").toString
    time("input corpus write") {
      turns.write.mode("overwrite").parquet(s"$base/in")
    }
    val q = time("stream start") {
      graft.streaming.StreamingIngest.start(spark, s"$base/in", s"$base/out",
        s"$base/ck", graft.kg.Pipeline.emptyDict(spark),
        graft.kg.Link.Config(fuzzy = false))
    }
    time("awaitTermination") { q.awaitTermination(600000) }
    q.recentProgress.foreach(p => println(s"[prof-stream] batch ${p.batchId}: " +
      s"rows=${p.numInputRows} durationMs=${p.durationMs}"))
    time("stream readTable+orderBy+noop") {
      graft.kg.Materialize.readTable(spark, s"$base/out/edges").get
        .orderBy(graft.kg.Materialize.edgeKey.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
