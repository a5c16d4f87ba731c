package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[DupSpans]] vs an in-memory brute force (window strings, no hashing) —
  * also proves the fingerprint path collision-free on these fixtures. */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
  private val runA = "a1 a2 a3 a4 a5 a6 a7 a8"
  private val runB = "c1 c2 c3 c4 c5 c6 c7 c8"

  private lazy val docs = Seq(
    // docs 1-3 share a 10-token boilerplate block at different offsets
    1L -> ("alpha beta " + boiler + " tail one two"),
    2L -> (boiler + " something else entirely here now"),
    3L -> ("x y z w " + boiler),
    // doc 4: all-unique text, no cross-doc windows
    4L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12",
    // doc 5: empty; doc 6: shorter than the window
    5L -> "",
    6L -> "tiny doc here",
    // docs 7/8 share TWO separated 8-token runs -> two spans each
    7L -> (runA + " mid1 mid2 mid3 mid4 mid5 mid6 mid7 mid8 mid9 " + runB),
    8L -> (runA + " unrelated filler words go here right now ok " + runB),
    // doc 9: internal repetition only (same window twice in ONE doc) must
    // NOT count at minDocs=2 (countDistinct docs == 1)
    9L -> ("r1 r2 r3 r4 r5 r6 r7 r8 pad1 pad2 r1 r2 r3 r4 r5 r6 r7 r8"))
    .toDF("doc_id", "text")

  /** window-string brute force mirroring the operator's definition. */
  private def brute(rows: Seq[(Long, String)], w: Int, minDocs: Int)
      : Map[Long, (Long, Long, Long, Double)] = {
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val wins = rows.flatMap { case (id, t) =>
      toks(t).sliding(w).filter(_.length == w).zipWithIndex
        .map { case (win, pos) => (id, pos, win.mkString(" ")) }
    }
    val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= minDocs)
      .keySet
    rows.map { case (id, t) =>
      val n = toks(t).length
      val pos = wins.collect { case (`id`, p, s) if dup(s) => p }.sorted
      val islands = pos.foldLeft(List.empty[(Int, Int)]) {
        case ((mn, mx) :: rest, p) if p - mx <= w => (mn, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      val cov = islands.map { case (mn, mx) => mx - mn + w }.sum
      id -> ((n.toLong, pos.size.toLong, islands.size.toLong,
        cov.toDouble / math.max(n, 1)))
    }.toMap
  }

  private def run(w: Int, frame: org.apache.spark.sql.DataFrame = null,
      maxBroadcastRows: Long = 50000000L)
      : Map[Long, (Long, Long, Long, Double)] =
    DupSpans.dupSpanStats(Option(frame).getOrElse(docs), windowW = w,
        maxBroadcastRows = maxBroadcastRows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap

  test("dupSpanStats == window-string brute force (w=8, minDocs=2)") {
    val rows = docs.as[(Long, String)].collect().toSeq
    val expect = brute(rows, w = 8, minDocs = 2)
    val got = run(w = 8)
    assert(got == expect)
    // sanity on the planted structure: boilerplate -> 1 span in docs 1-3,
    // two separated runs -> 2 spans in docs 7/8, internal-only repeat -> 0
    assert(got(1L)._3 == 1 && got(2L)._3 == 1 && got(3L)._3 == 1)
    assert(got(7L)._3 == 2 && got(8L)._3 == 2)
    assert(got(4L) == ((12L, 0L, 0L, 0.0)))
    assert(got(5L) == ((0L, 0L, 0L, 0.0)))
    assert(got(9L)._2 == 0)
  }

  test("w=4 matches brute force; result invariant to input partitioning") {
    val rows = docs.as[(Long, String)].collect().toSeq
    assert(run(w = 4) == brute(rows, w = 4, minDocs = 2))
    assert(run(w = 4, frame = docs.repartition(7)) == run(w = 4))
  }

  test("keyed-join path (broadcast gate forced off) matches the default") {
    val a = run(w = 8)
    val b = run(w = 8, maxBroadcastRows = 0L)
    assert(a == b && a.nonEmpty)
  }

  test("config guards throw") {
    intercept[IllegalArgumentException](DupSpans.dupSpanStats(docs, windowW = 0))
    intercept[IllegalArgumentException](
      DupSpans.dupSpanStats(docs, windowW = 8, minDocs = 1))
  }
}
