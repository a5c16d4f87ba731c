package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[SemDedup]] vs an in-memory brute force: precision is exact by
  * construction (every emitted pair carries its exact cosine), recall is
  * exact on a cluster-separable fixture, and the decision table matches a
  * driver-side union-find over the brute-force pair set. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** deterministic corpus: 3 clusters of 20 vectors in 16-dim (the
    * SimilaritySpec fixture — within-cluster cosines land well above 0.95,
    * cross-cluster far below). */
  private def corpus = {
    import spark.implicits._
    (0 until 60).map { i =>
      val cluster = i % 3
      val base = Array.tabulate(16)(d => if (d % 3 == cluster) 1.0f else 0.05f)
      val jitter = Array.tabulate(16)(d =>
        ((i * 31 + d * 7) % 13 - 6) / 100.0f)
      (i.toLong, base.zip(jitter).map { case (a, b) => a + b }.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private val threshold = 0.95

  private lazy val brutePairs: Set[(Long, Long)] = {
    val rows = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    (for {
      (ia, va) <- rows
      (ib, vb) <- rows
      if ia < ib && Similarity.cosineKernel(va, vb) >= threshold
    } yield (ia, ib)).toSet
  }

  test("recall: cluster-scoped pairs == brute force on a separable corpus") {
    val got = SemDedup.pairs(corpus,
        SemDedup.Config(nLists = 3, kmeansIters = 3, assign = 2, threshold = threshold))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brutePairs.nonEmpty)
    assert(got == brutePairs)
  }

  test("precision + pair uniqueness under heavy multi-assignment") {
    val got = SemDedup.pairs(corpus,
        SemDedup.Config(nLists = 6, kmeansIters = 3, assign = 4, threshold = threshold))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.distinct.size == got.size, "first-common-cluster rule must dedupe")
    assert(got.toSet.subsetOf(brutePairs), "every emitted pair is exact-verified")
  }

  test("decisions match driver-side union-find; singletons kept") {
    // brute-force union-find over the exact pair set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    brutePairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0L until 60L).map(id => id -> find(id)).toMap
    val got = SemDedup.decisions(corpus,
        SemDedup.Config(nLists = 3, kmeansIters = 3, assign = 2, threshold = threshold))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 60)
    got.foreach { case (id, rep, kept) =>
      assert(rep == expected(id), s"vec $id: rep $rep != ${expected(id)}")
      assert(kept == (id == rep))
    }
  }

  test("over-cap clusters are dropped, not exploded") {
    val got = SemDedup.pairs(corpus,
      SemDedup.Config(nLists = 3, kmeansIters = 3, assign = 1,
        threshold = threshold, maxCluster = 1))
    assert(got.count() == 0)
  }
}
