package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Binary-proto Subgraph I/O — the reference bulk reader's second encoding
  * (`tools/megamind/cmd/dgraph_ingest_subgraph.go:100-116` accepts
  * `--encoding json|proto`; message model `subgraph/subgraph.proto:23-49`).
  * The 4-message wire format is hand-decoded here (varint / length-delimited
  * / fixed64 — no protobuf dependency), producing the same flat triple
  * schema as [[TripleJson.read]].
  *
  * FRAMING: records are standard varint-length-delimited protobuf streams
  * (`writeDelimitedTo` convention), NOT newline-framed. The reference reads
  * proto lines with `bufio.ReadLine`, but a serialized Subgraph containing
  * any triple BEGINS with tag byte 0x0A ((1<<3)|LEN) — the newline character
  * — so newline framing cannot carry this format at all; length-delimited
  * framing is the public-standard fix. Because length prefixes make the
  * stream non-splittable without sync markers, files are the unit of
  * parallelism (`binaryFiles`): bulk dumps ship as many files, which is also
  * how a 1000-executor cluster wants them.
  */
object TripleProto {

  // ---- varint / wire kernels (pure JVM, shared by encode + decode) ---------

  private[io] final class ByteReader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var out = 0L
      while (shift < 64) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def readFixed64(): Long = {
      var out = 0L
      var i = 0
      while (i < 8) { out |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint(); ()
      case 1 => pos += 8
      case 2 => val n = readVarint().toInt; pos += n
      case 5 => pos += 4
      case t => throw new IllegalArgumentException(s"unsupported wire type $t")
    }
  }

  private[io] final class ByteWriter {
    private val out = new java.io.ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def writeTag(field: Int, wire: Int): Unit = writeVarint((field.toLong << 3) | wire)
    def writeBytesField(field: Int, b: Array[Byte]): Unit = {
      writeTag(field, 2); writeVarint(b.length.toLong); out.write(b, 0, b.length)
    }
    def writeStringField(field: Int, s: String): Unit =
      writeBytesField(field, s.getBytes("UTF-8"))
    def writeVarintField(field: Int, v: Long): Unit = { writeTag(field, 0); writeVarint(v) }
    def writeFixed64Field(field: Int, v: Long): Unit = {
      writeTag(field, 1)
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** One decoded triple, flat (None = proto3 field absent). */
  final case class FlatTriple(
      subjType: Option[String], subjTuid: Option[String], pred: Option[String],
      objKind: Option[String], objType: Option[String], objTuid: Option[String],
      objString: Option[String], objInt64: Option[Long], objFloat64: Option[Double])

  private def decodeSubject(r: ByteReader): (Option[String], Option[String]) = {
    var tpe: Option[String] = None
    var tuid: Option[String] = None
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1, 2) =>
          val n = r.readVarint().toInt
          tpe = Some(new String(r.buf, r.pos, n, "UTF-8")); r.pos += n
        case (2, 2) =>
          val n = r.readVarint().toInt
          tuid = Some(new String(r.buf, r.pos, n, "UTF-8")); r.pos += n
        case (_, w) => r.skip(w)
      }
    }
    (tpe, tuid)
  }

  private def sub(r: ByteReader): ByteReader = {
    val n = r.readVarint().toInt
    val s = new ByteReader(r.buf, r.pos, r.pos + n)
    r.pos += n
    s
  }

  private def decodeTriple(r: ByteReader): FlatTriple = {
    var subjT: Option[String] = None; var subjId: Option[String] = None
    var pred: Option[String] = None
    var kind: Option[String] = None
    var oT: Option[String] = None; var oId: Option[String] = None
    var oS: Option[String] = None; var oI: Option[Long] = None; var oF: Option[Double] = None
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >>> 3, (tag & 7).toInt) match {
        case (1, 2) => // subject
          val (t, id) = decodeSubject(sub(r)); subjT = t; subjId = id
        case (2, 2) => // predicate
          val p = sub(r)
          while (p.hasMore) {
            val ptag = p.readVarint()
            if ((ptag >>> 3) == 1 && (ptag & 7) == 2) {
              val n = p.readVarint().toInt
              pred = Some(new String(p.buf, p.pos, n, "UTF-8")); p.pos += n
            } else p.skip((ptag & 7).toInt)
          }
        case (3, 2) => // object (oneof: last field wins, proto semantics)
          val o = sub(r)
          while (o.hasMore) {
            val otag = o.readVarint()
            ((otag >>> 3), (otag & 7).toInt) match {
              case (1, 2) =>
                val (t, id) = decodeSubject(sub(o))
                kind = Some("subject"); oT = t; oId = id
                oS = None; oI = None; oF = None
              case (2, 2) =>
                val n = o.readVarint().toInt
                kind = Some("string"); oS = Some(new String(o.buf, o.pos, n, "UTF-8"))
                o.pos += n; oT = None; oId = None; oI = None; oF = None
              case (3, 0) =>
                kind = Some("int64"); oI = Some(o.readVarint())
                oT = None; oId = None; oS = None; oF = None
              case (4, 1) =>
                kind = Some("float64")
                oF = Some(java.lang.Double.longBitsToDouble(o.readFixed64()))
                oT = None; oId = None; oS = None; oI = None
              case (_, w) => o.skip(w)
            }
          }
        case (_, w) => r.skip(w)
      }
    }
    FlatTriple(subjT, subjId, pred, kind, oT, oId, oS, oI, oF)
  }

  /** Decode one Subgraph message (field 1 = repeated Triple). */
  def decodeSubgraph(bytes: Array[Byte]): Seq[FlatTriple] = {
    val r = new ByteReader(bytes, 0, bytes.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[FlatTriple]
    while (r.hasMore) {
      val tag = r.readVarint()
      if ((tag >>> 3) == 1 && (tag & 7) == 2) out += decodeTriple(sub(r))
      else r.skip((tag & 7).toInt)
    }
    out.toSeq
  }

  /** Encode one Subgraph from flat triples (test/export path). */
  def encodeSubgraph(triples: Seq[FlatTriple]): Array[Byte] = {
    val w = new ByteWriter
    triples.foreach { t =>
      val tw = new ByteWriter
      def subj(field: Int, tpe: Option[String], tuid: Option[String], into: ByteWriter): Unit = {
        val sw = new ByteWriter
        tpe.foreach(sw.writeStringField(1, _))
        tuid.foreach(sw.writeStringField(2, _))
        into.writeBytesField(field, sw.toBytes)
      }
      subj(1, t.subjType, t.subjTuid, tw)
      val pw = new ByteWriter
      t.pred.foreach(pw.writeStringField(1, _))
      tw.writeBytesField(2, pw.toBytes)
      val ow = new ByteWriter
      t.objKind match {
        case Some("subject") => subj(1, t.objType, t.objTuid, ow)
        case Some("string") => t.objString.foreach(ow.writeStringField(2, _))
        case Some("int64") => t.objInt64.foreach(ow.writeVarintField(3, _))
        case Some("float64") =>
          t.objFloat64.foreach(d =>
            ow.writeFixed64Field(4, java.lang.Double.doubleToLongBits(d)))
        case _ => ()
      }
      tw.writeBytesField(3, ow.toBytes)
      w.writeBytesField(1, tw.toBytes)
    }
    w.toBytes
  }

  /** Write varint-length-delimited Subgraph records to one local file
    * (the test/export helper; a production dump writes many such files). */
  def writeDelimitedFile(path: String, subgraphs: Seq[Array[Byte]]): Unit = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try subgraphs.foreach { sg =>
      val w = new ByteWriter
      w.writeVarint(sg.length.toLong)
      out.write(w.toBytes)
      out.write(sg)
    } finally out.close()
  }

  /** Read length-delimited binary Subgraph files → flat triple rows, same
    * schema as [[TripleJson.read]]. `subgraph_id` is the sha-256 hex of the
    * subgraph message bytes (content-derived lineage, like the json path's
    * line hash). Parallelism is per file.
    *
    * Corruption posture: the stream has no sync markers, so a record that
    * fails to frame/decode makes the REST OF THAT FILE unrecoverable —
    * records before the corruption are kept, the file's remainder is
    * dropped, and the event is counted (one per aborted file, with the
    * discarded byte count) on the accumulators returned by
    * [[readCounted]] — the batch analog of the json path's
    * [[TripleJson.malformedCount]]. Other files are unaffected. */
  def read(spark: SparkSession, path: String): DataFrame =
    readCounted(spark, path)._1

  /** [[read]], plus (malformed_files, malformed_bytes) accumulators that
    * populate when the returned frame's action runs. */
  def readCounted(spark: SparkSession, path: String)
      : (DataFrame, (org.apache.spark.util.LongAccumulator,
                     org.apache.spark.util.LongAccumulator)) = {
    val badFiles = spark.sparkContext.longAccumulator("graft.proto.malformed_files")
    val badBytes = spark.sparkContext.longAccumulator("graft.proto.malformed_bytes")
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (_, pds) =>
      val buf = pds.toArray()
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val r = new ByteReader(buf, 0, buf.length)
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var ok = true
      var abortPos = -1
      while (ok && r.hasMore) {
        val recStart = r.pos
        try {
          val n = r.readVarint().toInt
          if (n < 0 || r.pos + n > buf.length) { ok = false; abortPos = recStart }
          else {
            val sg = java.util.Arrays.copyOfRange(buf, r.pos, r.pos + n)
            r.pos += n
            val id = md.digest(sg).map("%02x".format(_)).mkString
            decodeSubgraph(sg).foreach { t =>
              out += Row(id, t.subjType.orNull, t.subjTuid.orNull, t.pred.orNull,
                t.objKind.orNull, t.objType.orNull, t.objTuid.orNull,
                t.objString.orNull,
                t.objInt64.map(java.lang.Long.valueOf).orNull,
                t.objFloat64.map(java.lang.Double.valueOf).orNull)
            }
          }
        } catch { // truncated/garbled record: drop the file's remainder
          case _: Exception => ok = false; abortPos = recStart
        }
      }
      if (abortPos >= 0) { badFiles.add(1L); badBytes.add((buf.length - abortPos).toLong) }
      out
    }
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("subgraph_id", StringType),
      StructField("subj_type", StringType),
      StructField("subj_tuid", StringType),
      StructField("pred", StringType),
      StructField("obj_kind", StringType),
      StructField("obj_type", StringType),
      StructField("obj_tuid", StringType),
      StructField("obj_string", StringType),
      StructField("obj_int64", LongType),
      StructField("obj_float64", DoubleType))))
    (df, (badFiles, badBytes))
  }
}
