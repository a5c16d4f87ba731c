package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs(rows: (Long, Seq[Float])*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // 3-dim fixture: dim 0 spans [-2, 6], dim 1 is FLAT (mx == mn), dim 2
  // hits both extremes exactly
  private val corpus = Seq(
    0L -> Seq(-2.0f, 5.0f, 0.0f),
    1L -> Seq(6.0f, 5.0f, 1.0f),
    2L -> Seq(0.0f, 5.0f, 0.25f),
    3L -> Seq(2.0f, 5.0f, 0.75f))

  test("fit == per-dimension min/max; flat dim codes to 0, extremes clamp") {
    val p = Quantize.fit(vecs(corpus: _*))
    assert(p.mins.toSeq == Seq(-2.0f, 5.0f, 0.0f))
    assert(p.maxes.toSeq == Seq(6.0f, 5.0f, 1.0f))
    val codes = Quantize.encode(vecs(corpus: _*), p)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // driver-side brute force of the same formula
    def brute(v: Seq[Float]): Seq[Int] = v.indices.map { i =>
      val mn = p.mins(i).toDouble; val mx = p.maxes(i).toDouble
      val c = if (mx == mn) 0.0
        else math.floor((v(i).toDouble - mn) * 255.0 / (mx - mn))
      math.max(0.0, math.min(255.0, c)).toInt
    }
    corpus.foreach { case (id, v) => assert(codes(id) == brute(v), s"vec $id") }
    assert(codes(0L)(0) == 0 && codes(1L)(0) == 255, "extreme ends clamp")
    assert(corpus.forall { case (id, _) => codes(id)(1) == 0 }, "flat dim -> 0")
  }

  test("dequantize error bounded by one grid step; flat dim exact") {
    val p = Quantize.fit(vecs(corpus: _*))
    val dq = Quantize.dequantize(Quantize.encode(vecs(corpus: _*), p), p)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    corpus.foreach { case (id, v) =>
      v.indices.foreach { i =>
        val step = (p.maxes(i) - p.mins(i)) / 255.0
        assert(math.abs(dq(id)(i) - v(i)) <= step + 1e-6,
          s"vec $id dim $i: ${dq(id)(i)} vs ${v(i)}")
      }
    }
    assert(corpus.forall { case (id, _) => dq(id)(1) == 5.0f },
      "flat dim reconstructs exactly")
  }

  test("quantized kNN recall@10 >= 0.9 vs exact on the fixture embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.lit(50)) === 0)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries, 10))
    val quant = pairs(Quantize.knnTopK(emb, queries, 10))
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("ragged dims, null vector, and wrong-dim encode all fail loudly") {
    import spark.implicits._
    val ragged = Seq(0L -> Seq(1.0f, 2.0f), 1L -> Seq(1.0f))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](Quantize.fit(ragged))
    assert(e1.getMessage.contains("ragged"))
    val p = Quantize.fit(vecs(corpus: _*))
    val bad = Seq(0L -> Seq(1.0f)).toDF("vec_id", "embedding")
    val e2 = intercept[Exception](Quantize.encode(bad, p).collect())
    assert(e2.getMessage.contains("dim") ||
      Option(e2.getCause).exists(_.getMessage.contains("dim")))
  }

  test("persisted q8 index: indexed == fresh; stale corpus throws") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.lit(50)) === 0)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("q_embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft-q8idx").toString
    Quantize.buildQ8Index(emb, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows(Quantize.knnQ8Indexed(emb, queries, 10, dir)) ==
      rows(Quantize.knnTopK(emb, queries, 10)))
    // stale guard: one extra corpus row changes the fingerprint
    val stale = emb.unionByName(
      Seq((999999L, Seq.fill(64)(0.5f), 0)).toDF("vec_id", "embedding", "label"))
    val e = intercept[IllegalArgumentException](
      Quantize.knnQ8Indexed(stale, queries, 10, dir))
    assert(e.getMessage.contains("does not match"))
  }

  test("codes invariant to input partitioning") {
    val p = Quantize.fit(vecs(corpus: _*))
    def run(parts: Int) = Quantize.encode(
        vecs(corpus: _*).repartition(parts), p)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(run(1) == run(4))
  }
}
