package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.kg.{Incremental, Materialize}
import graft.ops.{Dedup, DeltaDedup}

class DedupStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // batch 0: ten base docs; batch 1: five exact re-posts of batch-0 texts
  // (=> corpus), one within-batch dup pair (=> batch), four fresh
  private val batch0 = (0L until 10L).map(i =>
    (i, s"alpha bravo charlie delta echo foxtrot golf item$i"))
  private val batch1 =
    (100L until 105L).map(i => (i, batch0((i - 100L).toInt)._2)) ++
    Seq((105L, "hotel india juliet kilo lima mike november x"),
      (106L, "hotel india juliet kilo lima mike november x")) ++
    (107L until 111L).map(i =>
      (i, s"oscar papa quebec romeo sierra tango unique$i"))

  private val cfg = Dedup.MinHashConfig(jaccardThreshold = 0.5)

  private def table(dir: String) =
    Materialize.readTable(spark, dir).map(_.collect().map(_.toString).toSet)
      .getOrElse(Set.empty[String])

  test("streamed ingest == sequential DeltaDedup.ingest; restart is a no-op") {
    val in = Files.createTempDirectory("graft-dstream-in").toString
    val state = Files.createTempDirectory("graft-dstream-state").toString
    val out = Files.createTempDirectory("graft-dstream-out").toString
    val ck = Files.createTempDirectory("graft-dstream-ck").toString

    // drain batch 0, then add batch 1's file and drain again — two
    // micro-batches with real cross-batch state in between
    docs(batch0).coalesce(1).write.parquet(s"$in/b0")
    // the file source lists files RECURSIVELY only under the glob; write
    // dirs are fine as long as the path points at the parent of part files
    val q1 = DedupStream.start(spark, s"$in/*", state, out, ck, cfg)
    q1.awaitTermination(120000)
    docs(batch1).coalesce(1).write.parquet(s"$in/b1")
    val q2 = DedupStream.start(spark, s"$in/*", state, out, ck, cfg)
    q2.awaitTermination(120000)

    // library reference: same batches, same order, fresh state
    val state2 = Files.createTempDirectory("graft-dstream-state2").toString
    val r0 = DeltaDedup.ingest(spark, state2, docs(batch0), cfg)
    val r1 = DeltaDedup.ingest(spark, state2, docs(batch1), cfg)
    val wantClassified =
      (r0.classified.collect() ++ r1.classified.collect()).map(_.toString).toSet
    val wantPairs =
      (r0.candidates.collect() ++ r1.candidates.collect()).map(_.toString).toSet

    assert(table(s"$out/classified") == wantClassified)
    assert(table(s"$out/pairs") == wantPairs)
    // the interesting rows actually exist: corpus dups + a batch dup
    import org.apache.spark.sql.functions._
    val byKind = Materialize.readTable(spark, s"$out/classified").get
      .groupBy(col("dup_kind")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("corpus") == 5 && byKind("batch") == 1)

    // restart with the same checkpoint and no new files: nothing changes
    val q3 = DedupStream.start(spark, s"$in/*", state, out, ck, cfg)
    q3.awaitTermination(120000)
    assert(table(s"$out/classified") == wantClassified)

    // ledger skip: a FRESH source checkpoint re-reads every file as
    // micro-batch 0, which the _checkpoints ledger already marks done —
    // the batch is skipped, outputs and state untouched
    val ck2 = Files.createTempDirectory("graft-dstream-ck2").toString
    val sigsBefore = table(s"$state/sigs")
    val q4 = DedupStream.start(spark, s"$in/*", state, out, ck2, cfg)
    q4.awaitTermination(120000)
    assert(table(s"$out/classified") == wantClassified)
    assert(table(s"$state/sigs") == sigsBefore)
    val ledgered = Incremental.readCheckpoints(spark, out)
      .filter(col("stage") === "dedup-ingest").count()
    assert(ledgered == 2) // b0, b1 — the skipped replay appended nothing
  }

  test("ingest replay (no ledger) is idempotent: classification, pairs and state unchanged") {
    val state = Files.createTempDirectory("graft-replay-state").toString
    val first = DeltaDedup.ingest(spark, state, docs(batch0), cfg)
    val r1 = DeltaDedup.ingest(spark, state, docs(batch1), cfg)
    val want = r1.classified.collect().map(_.toString).toSet
    val wantPairs = r1.candidates.collect().map(_.toString).toSet
    val hashesBefore = table(s"$state/hashes")
    assert(first.classified.count() == 10)

    // simulate the crash-after-fold replay: SAME batch again
    val replay = DeltaDedup.ingest(spark, state, docs(batch1), cfg)
    assert(replay.classified.collect().map(_.toString).toSet == want)
    assert(replay.candidates.collect().map(_.toString).toSet == wantPairs)
    assert(table(s"$state/hashes") == hashesBefore) // novel-only: no growth
    // batch-1's own docs did NOT downgrade to 'corpus' on replay
    import org.apache.spark.sql.functions._
    assert(replay.classified.filter(col("dup_kind") === "corpus").count() == 5)
  }
}
