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
