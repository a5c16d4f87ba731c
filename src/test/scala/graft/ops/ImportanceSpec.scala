package graft.ops

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.TextHashKernels

/** DSIR importance weighting: brute-force parity against an in-memory
  * reimplementation of the smoothed hashed-unigram log-ratio, directional
  * sanity (target-like raw docs outscore the rest), and deterministic
  * Gumbel-top-k parity. */
class ImportanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val B = 64
  private def bucket(tok: String): Int = {
    val h = TextHashKernels.fingerprint64(UTF8String.fromString(tok))
    (((h % B) + B) % B).toInt
  }
  private def toks(text: String): Seq[String] =
    "\\S+".r.findAllIn(text.toLowerCase).toSeq

  /** In-memory DSIR score with the same smoothing (alpha = 1). */
  private def bruteScores(raw: Seq[(Long, String)], target: Seq[String])
      : Map[Long, (Long, Double)] = {
    val ct = target.flatMap(toks).groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val cr = raw.flatMap(x => toks(x._2)).groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val tt = ct.values.sum.toDouble
    val rt = cr.values.sum.toDouble
    raw.map { case (id, text) =>
      val ts = toks(text)
      val w = ts.map { t =>
        val b = bucket(t)
        math.log(ct.getOrElse(b, 0L) + 1.0) - math.log(tt + B) -
          math.log(cr.getOrElse(b, 0L) + 1.0) + math.log(rt + B)
      }.sum
      id -> (ts.size.toLong, w)
    }.toMap
  }

  private val target = Seq(
    "alpha beta gamma delta", "alpha beta epsilon", "gamma delta alpha",
    "beta beta gamma", "delta epsilon alpha beta")
  private val raw = Seq[(Long, String)](
    1L -> "alpha beta gamma",              // target-like
    2L -> "zulu yankee xray whiskey",      // off-distribution
    3L -> "alpha delta epsilon beta",      // target-like
    4L -> "victor uniform tango sierra",   // off-distribution
    5L -> "beta gamma zulu",               // mixed
    6L -> "")                              // token-less

  test("dsirWeights == brute force (and empty docs surface with weight 0)") {
    import spark.implicits._
    val rawDf = raw.toDF("doc_id", "text")
    val tgtDf = target.zipWithIndex.map(x => (1000L + x._2, x._1)).toDF("doc_id", "text")
    val got = Importance.dsirWeights(rawDf, tgtDf, Importance.DsirConfig(buckets = B))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getFloat(2))).toMap
    val want = bruteScores(raw, target)
    assert(got.keySet == raw.map(_._1).toSet)
    for ((id, (n, w)) <- want) {
      assert(got(id)._1 == n, s"n_tokens doc $id")
      assert(math.abs(got(id)._2 - w) < 1e-5, s"weight doc $id: ${got(id)._2} vs $w")
    }
    assert(got(6L) == ((0L, 0.0f)))
    // directional: target-vocabulary docs beat off-distribution ones
    assert(got(1L)._2 > got(2L)._2 && got(3L)._2 > got(4L)._2)
    assert(got(5L)._2 > got(2L)._2 && got(5L)._2 < got(1L)._2)
  }

  test("resampleTopK == brute-force Gumbel keys, deterministic across runs") {
    import spark.implicits._
    val rawDf = raw.toDF("doc_id", "text")
    val tgtDf = target.zipWithIndex.map(x => (1000L + x._2, x._1)).toDF("doc_id", "text")
    val m = 1L << 53
    def gumbel(id: Long): Double = {
      val h = TextHashKernels.fingerprint64(UTF8String.fromString(s"dsir|$id"))
      val cell = ((h % m) + m) % m
      val u = (cell + 1).toDouble / (m + 2).toDouble
      -math.log(-math.log(u))
    }
    val want = bruteScores(raw, target).toSeq
      .map { case (id, (_, w)) => (id, w.toFloat.toDouble / 0.5 + gumbel(id)) }
      .sortBy { case (id, k) => (-k, id) }.take(3).map(_._1)
    val run = () => Importance.resampleTopK(rawDf, tgtDf, 3, temperature = 0.5,
        Importance.DsirConfig(buckets = B))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val got = run()
    assert(got == want, s"$got vs $want")
    assert(run() == got) // pure function of ids: stable draw
  }
}
