package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TripleProtoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Same golden subgraphs as TripleJsonSpec (the reference's
    * `testdata/subgraphs.json` shape), expressed as flat triples. */
  private val golden: Seq[Seq[TripleProto.FlatTriple]] = {
    import TripleProto.FlatTriple
    Seq(
      Seq(FlatTriple(Some("Person"), Some("1"), Some("name"),
        Some("string"), None, None, Some("Bob"), None, None)),
      Seq(FlatTriple(Some("Person"), Some("1"), Some("age"),
        Some("int64"), None, None, None, Some(42L), None)),
      Seq(FlatTriple(Some("City"), Some("Oslo"), Some("temperature"),
        Some("float64"), None, None, None, None, Some(-3.5))),
      Seq(
        FlatTriple(Some("Person"), Some("1"), Some("works_at"),
          Some("subject"), Some("Org"), Some("acme"), None, None, None),
        FlatTriple(Some("Org"), Some("acme"), Some("name"),
          Some("string"), None, None, Some("Acme"), None, None)))
  }

  test("wire codec round-trips all four object-oneof kinds byte-exactly") {
    golden.foreach { triples =>
      val bytes = TripleProto.encodeSubgraph(triples)
      assert(TripleProto.decodeSubgraph(bytes) == triples)
    }
    // negative int64: 10-byte varint path
    val neg = Seq(TripleProto.FlatTriple(Some("T"), Some("x"), Some("p"),
      Some("int64"), None, None, None, Some(-42L), None))
    assert(TripleProto.decodeSubgraph(TripleProto.encodeSubgraph(neg)) == neg)
  }

  test("an encoded subgraph starts with byte 0x0A - newline framing is impossible") {
    // documents WHY this reader uses length-delimited framing instead of the
    // reference's bufio.ReadLine: the Subgraph.triples tag byte IS '\n'
    val bytes = TripleProto.encodeSubgraph(golden.head)
    assert(bytes(0) == 0x0a.toByte)
  }

  test("proto file read matches the json reader on the same subgraphs") {
    val dir = Files.createTempDirectory("proto-sg")
    TripleProto.writeDelimitedFile(s"$dir/part-0.pb",
      golden.map(TripleProto.encodeSubgraph))
    val fromProto = TripleProto.read(spark, s"$dir/part-0.pb")

    val jsonFile = Files.createTempFile("subgraphs", ".json")
    Files.writeString(jsonFile, Seq(
      """{"triples":[{"subject":{"type":"Person","tuid":"1"},"predicate":{"name":"name"},"object":{"string":"Bob"}}]}""",
      """{"triples":[{"subject":{"type":"Person","tuid":"1"},"predicate":{"name":"age"},"object":{"int64":"42"}}]}""",
      """{"triples":[{"subject":{"type":"City","tuid":"Oslo"},"predicate":{"name":"temperature"},"object":{"float64":-3.5}}]}""",
      """{"triples":[{"subject":{"type":"Person","tuid":"1"},"predicate":{"name":"works_at"},"object":{"subject":{"type":"Org","tuid":"acme"}}},{"subject":{"type":"Org","tuid":"acme"},"predicate":{"name":"name"},"object":{"string":"Acme"}}]}""")
      .mkString("\n"))
    val fromJson = TripleJson.read(spark, jsonFile.toString)

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("subj_type"), r.getAs[String]("subj_tuid"),
        r.getAs[String]("pred"), r.getAs[String]("obj_kind"),
        Option(r.getAs[String]("obj_type")), Option(r.getAs[String]("obj_tuid")),
        Option(r.getAs[String]("obj_string")),
        Option(r.getAs[java.lang.Long]("obj_int64")),
        Option(r.getAs[java.lang.Double]("obj_float64")))
    assert(fromProto.collect().map(key).sortBy(_.toString).toSeq ==
      fromJson.collect().map(key).sortBy(_.toString).toSeq)
    assert(fromProto.schema == fromJson.schema)
  }

  test("truncated trailing record is dropped, not fatal — and counted, not silent") {
    val dir = Files.createTempDirectory("proto-trunc")
    val good = golden.map(TripleProto.encodeSubgraph)
    val path = s"$dir/part-0.pb"
    TripleProto.writeDelimitedFile(path, good)
    // append a length prefix with missing payload
    val out = new java.io.FileOutputStream(path, true)
    out.write(Array[Byte](0x60, 0x01)) // claims a 224-byte record, then EOF
    out.close()
    // a second, clean file must be unaffected by the first file's corruption
    TripleProto.writeDelimitedFile(s"$dir/part-1.pb", good.take(1))
    val (df, (badFiles, badBytes)) = TripleProto.readCounted(spark, s"$dir/part-*.pb")
    val n = df.count()
    assert(n == 5 + golden.head.size)
    assert(badFiles.value == 1L) // one aborted file...
    assert(badBytes.value == 2L) // ...its 2 trailing bytes discarded
  }

  test("mid-file corruption keeps prior records, drops the remainder, counts bytes") {
    val dir = Files.createTempDirectory("proto-mid")
    val sgs = golden.map(TripleProto.encodeSubgraph)
    val path = s"$dir/part-0.pb"
    // record 0 valid, then garbage that parses as an absurd length, then
    // record 1 — unreachable without sync markers, so it must be dropped
    assert(sgs.head.length < 128) // single-byte varint below
    val fos = new java.io.FileOutputStream(path)
    fos.write(sgs.head.length)
    fos.write(sgs.head)
    val garbage = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f)
    fos.write(garbage)
    fos.write(sgs(1))
    fos.close()
    val (df, (badFiles, badBytes)) = TripleProto.readCounted(spark, path)
    assert(df.count() == golden.head.size)
    assert(badFiles.value == 1L)
    assert(badBytes.value == (garbage.length + sgs(1).length).toLong)
  }

  test("json reader survives a bad int64 value under ANSI mode") {
    val f = Files.createTempFile("badint", ".json")
    Files.writeString(f, Seq(
      """{"triples":[{"subject":{"type":"P","tuid":"1"},"predicate":{"name":"age"},"object":{"int64":"not-a-number"}}]}""",
      """{"triples":[{"subject":{"type":"P","tuid":"2"},"predicate":{"name":"age"},"object":{"int64":"7"}}]}""")
      .mkString("\n"))
    val df = TripleJson.read(spark, f.toString)
    assert(df.count() == 2) // no ANSI cast crash
    assert(df.filter("obj_int64 IS NULL").count() == 1)
    assert(TripleJson.malformedCount(spark, f.toString) == 1)
  }
}
