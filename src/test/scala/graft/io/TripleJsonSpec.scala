package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TripleJsonSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** NDJSON in the reference's protojson format — same shape as
    * `tools/megamind/cmd/testdata/subgraphs.json` (one Subgraph per line,
    * oneof object key, int64-as-string). */
  private val goldenLines = Seq(
    """{"triples":[{"subject":{"type":"Person","tuid":"1"},"predicate":{"name":"name"},"object":{"string":"Bob"}}]}""",
    """{"triples":[{"subject":{"type":"Person","tuid":"1"},"predicate":{"name":"age"},"object":{"int64":"42"}}]}""",
    """{"triples":[{"subject":{"type":"City","tuid":"Oslo"},"predicate":{"name":"temperature"},"object":{"float64":-3.5}}]}""",
    """{"triples":[{"subject":{"type":"Person","tuid":"1"},"predicate":{"name":"works_at"},"object":{"subject":{"type":"Org","tuid":"acme"}}},{"subject":{"type":"Org","tuid":"acme"},"predicate":{"name":"name"},"object":{"string":"Acme"}}]}""")

  private def writeGolden(extra: Seq[String] = Nil): String = {
    val f = Files.createTempFile("subgraphs", ".json")
    Files.writeString(f, (goldenLines ++ extra).mkString("\n"))
    f.toString
  }

  test("reads all four object-oneof kinds with protojson field names") {
    val df = TripleJson.read(spark, writeGolden())
    val rows = df.collect()
    assert(rows.length == 5)
    val kinds = rows.map(_.getAs[String]("obj_kind")).groupBy(identity).view.mapValues(_.length).toMap
    assert(kinds == Map("string" -> 2, "int64" -> 1, "float64" -> 1, "subject" -> 1))
    val age = rows.find(_.getAs[String]("pred") == "age").get
    assert(age.getAs[Long]("obj_int64") == 42L) // protojson int64-as-string round-trip
    val temp = rows.find(_.getAs[String]("pred") == "temperature").get
    assert(temp.getAs[Double]("obj_float64") == -3.5)
    val edge = rows.find(_.getAs[String]("pred") == "works_at").get
    assert(edge.getAs[String]("obj_type") == "Org" && edge.getAs[String]("obj_tuid") == "acme")
  }

  test("malformed lines are counted, not fatal (batch analog of HTTP 400)") {
    val path = writeGolden(Seq("{not json", """{"other":"shape"}"""))
    assert(TripleJson.read(spark, path).count() == 5)
    assert(TripleJson.malformedCount(spark, path) == 2)
  }

  test("duplicate malformed lines count once each (per-line, not per-distinct-text)") {
    val f = Files.createTempFile("dupbad", ".json")
    val badLine =
      """{"triples":[{"subject":{"type":"P","tuid":"1"},"predicate":{"name":"age"},"object":{"int64":"oops"}}]}"""
    val goodLine =
      """{"triples":[{"subject":{"type":"P","tuid":"2"},"predicate":{"name":"age"},"object":{"int64":"7"}}]}"""
    Files.writeString(f, Seq(badLine, badLine, goodLine, "not json at all",
      "not json at all").mkString("\n"))
    // 2 duplicate bad-int64 lines + 2 duplicate unparseable lines = 4
    assert(TripleJson.malformedCount(spark, f.toString) == 4)
  }

  test("write → read round-trip is lossless") {
    val df = TripleJson.read(spark, writeGolden())
    val lines = TripleJson.toJsonLines(df)
    val f = Files.createTempFile("roundtrip", ".json")
    Files.writeString(f,
      lines.collect().map(_.getAs[String]("line")).sorted.mkString("\n"))
    val df2 = TripleJson.read(spark, f.toString)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("subj_type"), r.getAs[String]("subj_tuid"),
        r.getAs[String]("pred"), r.getAs[String]("obj_kind"),
        Option(r.getAs[String]("obj_type")), Option(r.getAs[String]("obj_tuid")),
        Option(r.getAs[String]("obj_string")),
        Option(r.getAs[java.lang.Long]("obj_int64")),
        Option(r.getAs[java.lang.Double]("obj_float64")))
    assert(df2.collect().map(key).toSet == df.collect().map(key).toSet)
  }

  test("subgraphStats reproduces the reference's counts including its object-branch bug") {
    // two triples in ONE subgraph: Person/1 -> works_at -> Org/acme, and a
    // second subject Person/2. Reference count = 2 distinct SUBJECT keys
    // (Org/acme on the object side is never counted — ingest.go:93-101);
    // fixed count = 3.
    val line =
      """{"triples":[{"subject":{"type":"Person","tuid":"1"},"predicate":{"name":"works_at"},"object":{"subject":{"type":"Org","tuid":"acme"}}},{"subject":{"type":"Person","tuid":"2"},"predicate":{"name":"name"},"object":{"string":"x"}}]}"""
    val f = Files.createTempFile("stats", ".json")
    Files.writeString(f, line)
    val stats = TripleJson.subgraphStats(TripleJson.read(spark, f.toString)).collect().head
    assert(stats.getAs[Long]("num_of_triples") == 2L)
    assert(stats.getAs[Long]("distinct_subjects_ref") == 2L)
    assert(stats.getAs[Int]("distinct_subjects_fixed") == 3)
  }

  test("empty subgraph => zero counts (mirrors the reference's only unit test)") {
    // /root/reference/services/ingest/ingest/ingest_test.go:11-20
    val f = Files.createTempFile("empty", ".json")
    Files.writeString(f, """{"triples":[]}""")
    val df = TripleJson.read(spark, f.toString)
    assert(df.count() == 0)
  }
}
