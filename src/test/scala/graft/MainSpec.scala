package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.kg.{Link, Materialize, Pipeline, Transcripts}

/** graft.Main is the user-facing promise ("run the pipeline on MY table
  * into MY output dir") — drive it end-to-end in-process (Main joins the
  * live test session and must not stop it). */
class MainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transcript run builds the KG, resumes idempotently, and resolver flag works") {
    val base = Files.createTempDirectory("graft-main").toString
    val turns = Transcripts.fromTestdataResolve(spark, "/root/testdata/sf0.001")
    turns.write.mode("overwrite").parquet(s"$base/in")

    Main.main(Array("--in", s"$base/in", "--out", s"$base/kg", "--buckets", "2"))
    assert(spark.sparkContext.isStopped == false) // session survived
    val edges1 = Materialize.readTable(spark, s"$base/kg/edges").get.count()
    val nodes1 = Materialize.readTable(spark, s"$base/kg/nodes").get.count()
    assert(edges1 > 0 && nodes1 > 0)

    // re-run: completed buckets skipped, table unchanged (idempotent MERGE)
    Main.main(Array("--in", s"$base/in", "--out", s"$base/kg", "--buckets", "2"))
    assert(Materialize.readTable(spark, s"$base/kg/edges").get.count() == edges1)

    // resolver compaction merges the " jr" aliases the exact per-bucket
    // linking kept apart
    Main.main(Array("--in", s"$base/in", "--out", s"$base/kg", "--buckets", "2",
      "--resolve", "--exact-resolve", "--threshold", "0.8"))
    val nodes2 = Materialize.readTable(spark, s"$base/kg/nodes").get.count()
    assert(nodes2 < nodes1, s"resolver merged nothing: $nodes2 vs $nodes1")
  }

  test("ndjson bulk ingest builds a graph from subgraph files") {
    val base = Files.createTempDirectory("graft-main-nd").toString
    Files.writeString(java.nio.file.Paths.get(base, "sg.ndjson"), Seq(
      """{"triples":[{"subject":{"type":"Person","tuid":"p1"},"predicate":{"name":"name"},"object":{"string":"Ada"}}]}""",
      """{"triples":[{"subject":{"type":"Person","tuid":"p1"},"predicate":{"name":"works_at"},"object":{"subject":{"type":"Org","tuid":"acme"}}}]}""",
      """{"triples":[{"subject":{"type":"Person","tuid":"P1"},"predicate":{"name":"name"},"object":{"string":"Ada"}}]}""")
      .mkString("\n"))
    Main.main(Array("--in", s"$base/sg.ndjson", "--format", "ndjson",
      "--out", s"$base/kg"))
    val edges = Materialize.readTable(spark, s"$base/kg/edges").get.collect()
    // normalization links p1/P1; duplicate name edges collapse in the MERGE
    assert(edges.length == 2)
    val persons = Materialize.readTable(spark, s"$base/kg/nodes").get
      .filter("entity_type = 'Person'").count()
    assert(persons == 1)
  }
}
