package graft.kg

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The raw-triple stage boundary has two forms (Pipeline.stageDir): a
  * serialized block-manager cache (default) and a parquet staging table
  * (`-Dgraft.stage.dir=...`, the constant-memory cluster form). They must be
  * semantically invisible: identical edges/nodes either way. */
class StagingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def edgeSet(r: Pipeline.Result): Set[String] =
    r.edges.collect().map(_.mkString("|")).toSet

  test("parquet staging boundary produces identical output to cached boundary") {
    val turns = Transcripts.synthetic(spark,
      Transcripts.GenConfig(seed = 7L, nConvs = 300, turnsPerConv = 8), partitions = 8)
    val dict = Pipeline.syntheticDict(spark)

    assert(Pipeline.stageDir.isEmpty) // default mode in tests
    val cached = Pipeline.run(turns, dict)
    val cachedEdges = edgeSet(cached)
    cached.close()

    val dir = Files.createTempDirectory("graft-stage-spec").toString
    sys.props("graft.stage.dir") = dir
    try {
      assert(Pipeline.stageDir.contains(dir))
      val staged = Pipeline.run(turns, dict)
      val stagedEdges = edgeSet(staged)
      // the boundary actually materialized to parquet...
      assert(new java.io.File(dir).list().exists(_.startsWith("raw-")))
      staged.close()
      // ...and close() reclaims it — loop callers (per-bucket, per-micro-
      // batch) must not leak O(corpus) staging dirs per iteration
      assert(!new java.io.File(dir).list().exists(_.startsWith("raw-")))
      assert(stagedEdges == cachedEdges)
      assert(cachedEdges.nonEmpty)
    } finally {
      sys.props.remove("graft.stage.dir")
      ()
    }
  }
}
