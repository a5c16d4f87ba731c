package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.kg.{Link, Materialize, Pipeline, Transcripts}

class StreamingIngestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("AvailableNow stream drains input; result equals the batch pipeline") {
    val cfg = Transcripts.GenConfig(seed = 23L, nConvs = 40, turnsPerConv = 6)
    val turns = Transcripts.synthetic(spark, cfg, partitions = 2)

    val in = Files.createTempDirectory("graft-stream-in").toString
    turns.write.mode("overwrite").parquet(in)
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ck = Files.createTempDirectory("graft-stream-ck").toString

    val q = StreamingIngest.start(spark, in, out, ck, Pipeline.emptyDict(spark))
    q.awaitTermination(120000)

    val streamed = Materialize.readTable(spark, s"$out/edges").get.collect().toSet
    val batch = Pipeline.run(turns, Pipeline.emptyDict(spark), Link.Config(fuzzy = false))
      .edges.collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)

    // restart with the same checkpoint: no new input => no change (exactly-
    // once bookkeeping on top of idempotent MERGE)
    val q2 = StreamingIngest.start(spark, in, out, ck, Pipeline.emptyDict(spark))
    q2.awaitTermination(120000)
    val streamed2 = Materialize.readTable(spark, s"$out/edges").get.collect().toSet
    assert(streamed2 == streamed)
  }

  test("in-stream delta resolver (resolveEvery): converged graph == batch pipeline + resolver") {
    import spark.implicits._
    val ts0 = new java.sql.Timestamp(0L)
    def turn(c: String, i: Int, text: String) =
      graft.model.Model.Turn(c, i, "user", text, "", ts0)
    // alias variants split across micro-batches: per-batch exact linking
    // keeps them apart; the per-trigger DELTA resolve converges them
    val f1 = Seq(
      turn("c1", 0, "My name is Grace Hopper."),
      turn("c1", 1, "Grace Hopper is 52 years old."),
      turn("c2", 0, "My name is Alan Turing."))
    val f2 = Seq(
      turn("c3", 0, "My name is Grace Hoppe."),   // fuzzy-merges with batch 1
      turn("c4", 0, "My name is Ada Lovelace."))  // new singleton
    val in = Files.createTempDirectory("graft-stream-rs-in").toString
    f1.toDS().repartition(1).write.parquet(s"$in/f1")
    f2.toDS().repartition(1).write.parquet(s"$in/f2")
    val out = Files.createTempDirectory("graft-stream-rs-out").toString
    val ck = Files.createTempDirectory("graft-stream-rs-ck").toString

    val resolveCfg = Link.Config(fuzzy = true, exactSameAs = true)
    val q = StreamingIngest.start(spark, s"$in/*", out, ck,
      Pipeline.emptyDict(spark), Link.Config(fuzzy = false),
      resolveEvery = 1, resolveCfg = resolveCfg,
      maxFilesPerTrigger = Some(1)) // one file per micro-batch
    q.awaitTermination(120000)

    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.selectExpr("concat_ws('|', subj_type, subj_guid, pred, obj_kind, " +
          "coalesce(obj_type,''), coalesce(obj_guid,''), coalesce(obj_string,''), " +
          "coalesce(cast(obj_int64 as string),''), coalesce(cast(obj_float64 as string),''))")
        .collect().map(_.getString(0)).toSet
    val streamed = edgeSet(Materialize.readTable(spark, s"$out/edges").get)

    // reference: one-shot batch pipeline over all turns + one full resolve
    val outB = Files.createTempDirectory("graft-stream-rs-ref").toString
    graft.kg.Incremental.run((f1 ++ f2).toDS(), Pipeline.emptyDict(spark),
      outB, "ref", nBuckets = 1, linkCfg = Link.Config(fuzzy = false))
    graft.kg.Incremental.resolveDisjoint(spark, outB, resolveCfg)
    val batch = edgeSet(Materialize.readTable(spark, s"$outB/edges").get)

    assert(streamed == batch && streamed.nonEmpty)
    // the converged person set: grace hoppe (min rep), alan turing, ada lovelace
    val persons = Materialize.readTable(spark, s"$out/nodes").get
      .filter("entity_type = 'Person'").select("name").as[String].collect().toSet
    assert(persons == Set("grace hoppe", "alan turing", "ada lovelace"), persons.toString)
  }

  test("windowed turn-rate aggregation runs with watermark (memory sink)") {
    val cfg = Transcripts.GenConfig(seed = 29L, nConvs = 10, turnsPerConv = 6)
    val in = Files.createTempDirectory("graft-rates-in").toString
    Transcripts.synthetic(spark, cfg, partitions = 2).write.mode("overwrite").parquet(in)

    val q = StreamingIngest.turnRates(spark, in)
      .writeStream.outputMode("append")
      .format("memory").queryName("turn_rates")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; with AvailableNow the
    // final watermark closes all but the max-event-time window
    val n = spark.sql("SELECT count(*) FROM turn_rates").collect().head.getLong(0)
    assert(n >= 0) // query ran end-to-end; exact emission depends on watermark close
  }
}
