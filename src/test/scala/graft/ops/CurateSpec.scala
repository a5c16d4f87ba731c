package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Curate]] — planted per-stage drop cases, plus column-by-column
  * reconciliation against the standalone component ops. */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good =
    "the quick brown fox jumps over a lazy dog and then runs far away " +
    "to find more interesting things in the wide green world today"

  private lazy val docs = Seq(
    // 1: clean keeper; 2: exact duplicate of 1 (loses the min-id race)
    1L -> good,
    2L -> good,
    // 3/4: near-dup pair (3-gram jaccard >= 0.5), 4 is the non-rep
    3L -> (good + " with one tiny extra clause appended at the end"),
    // 5: contaminated (shares a 4-token shingle with the benchmark)
    5L -> ("completely different text that quotes the secret benchmark answer key " +
      "inside an otherwise ordinary and long enough paragraph of words " +
      "covering many various unrelated topics nobody anywhere ever measured"),
    // 6: too short for the quality gate
    6L -> "way too short",
    // 7: long enough but one token repeated -> fails distinct/repetition
    7L -> Array.fill(40)("spam").mkString(" "))
    .toDF("doc_id", "text")

  private lazy val bench = Seq(
    100L -> "the secret benchmark answer key is fortytwo exactly")
    .toDF("doc_id", "text")

  private lazy val out = Curate.curate(docs, bench).collect()
    .map(r => r.getLong(0) -> r).toMap

  test("planted per-stage drops land on the right flag") {
    assert(out.keySet == Set(1L, 2L, 3L, 5L, 6L, 7L))
    assert(out(1L).getAs[Boolean]("kept"))
    // 2 is the exact-dup loser (and, being identical to 1, also a near-dup
    // group member whose rep is 1) — but clean on every content gate
    assert(!out(2L).getAs[Boolean]("keep_exact") && !out(2L).getAs[Boolean]("keep_neardup"))
    assert(!out(2L).getAs[Boolean]("kept"))
    assert(out(2L).getAs[Boolean]("clean_contam") && out(2L).getAs[Boolean]("pass_quality"))
    // 3 near-dups with 1 (and 2): smallest id in its group is 1, so 3 is
    // a non-representative member
    assert(!out(3L).getAs[Boolean]("keep_neardup"))
    assert(!out(5L).getAs[Boolean]("clean_contam") && !out(5L).getAs[Boolean]("kept"))
    assert(out(5L).getAs[Boolean]("keep_exact") && out(5L).getAs[Boolean]("pass_quality"))
    assert(!out(6L).getAs[Boolean]("pass_quality"))
    assert(!out(7L).getAs[Boolean]("pass_repetition") && !out(7L).getAs[Boolean]("pass_quality"))
  }

  test("flags reconcile column-by-column with the component ops") {
    val cfg = Curate.Config()
    val exact = Dedup.exact(docs).collect()
      .map(r => r.getAs[Long]("keep_doc_id")).toSet
    val groups = Dedup.dedupGroups(Dedup.ngramJaccardPairs(docs,
        cfg.neardupShingleN, cfg.minJaccard)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val contam = Contamination.flagContaminated(docs, bench,
        cfg.contamShingleN).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("contaminated")).toMap
    val qual = TextStats.quality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens") >= cfg.minTokens &&
         r.getAs[Double]("punct_ratio") <= cfg.maxPunctRatio &&
         r.getAs[Double]("distinct_ratio") >= cfg.minDistinctRatio)).toMap
    val rep = TextStats.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_word_frac") <= cfg.maxDupWordFrac &&
         r.getAs[Double]("top_bigram_frac") <= cfg.maxTopBigramFrac &&
         r.getAs[Double]("dup_trigram_frac") <= cfg.maxDupTrigramFrac)).toMap
    out.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("keep_exact") == exact.contains(id), s"exact $id")
      assert(r.getAs[Boolean]("keep_neardup") ==
        groups.get(id).forall(_ == id), s"neardup $id")
      assert(r.getAs[Boolean]("clean_contam") == !contam(id), s"contam $id")
      assert(r.getAs[Boolean]("pass_quality") == qual(id), s"quality $id")
      assert(r.getAs[Boolean]("pass_repetition") == rep(id), s"repetition $id")
      assert(r.getAs[Boolean]("kept") ==
        (r.getAs[Boolean]("keep_exact") && r.getAs[Boolean]("keep_neardup") &&
         r.getAs[Boolean]("clean_contam") && r.getAs[Boolean]("pass_quality") &&
         r.getAs[Boolean]("pass_repetition")), s"kept $id")
    }
  }

  test("config thresholds move the gates") {
    val strict = Curate.curate(docs, bench,
      Curate.Config(minTokens = 1000L)).collect()
    assert(strict.forall(!_.getAs[Boolean]("pass_quality")))
    val lax = Curate.curate(docs, bench,
      Curate.Config(minTokens = 1L, minDistinctRatio = 0.0,
        maxDupWordFrac = 1.0, maxTopBigramFrac = 1.0,
        maxDupTrigramFrac = 1.0)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(lax(6L).getAs[Boolean]("pass_quality") && lax(7L).getAs[Boolean]("kept"))
  }
}
