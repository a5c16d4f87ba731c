package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding: array<float>, label)`).
  *
  * Two paths:
  *  - [[Similarity.bruteForceTopK]]: exact cosine top-k — the correctness
  *    baseline. Queries are broadcast against the corpus (one scan, no
  *    all-pairs shuffle); per-query top-k via window.
  *  - [[Similarity.lshTopK]]: random-hyperplane (sign) LSH — the scale path.
  *    Deterministic pseudo-random hyperplanes derived from a seed via
  *    xxhash64, multi-table banding, candidates meet on (table, bucket)
  *    equi-join keys; exact cosine re-rank inside candidates. Recall is
  *    tunable by tables × bits; precision is exact (verified re-rank).
  *
  * All vector math is pure column expressions (`zip_with`/`aggregate`) in
  * double precision with deterministic left-to-right accumulation.
  */
object Similarity {

  /** dot(a,b) with double accumulation, index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query row.
    * `queries` must have (query_id, q_embedding). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("q_embedding"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Deterministic hyperplane component for (seed, table, bit, dim):
    * xxhash64 of the packed indices, mapped to ±1. */
  private def hyper(seed: Int, table: Int, bit: Int, dim: Column): Column =
    when(pmod(xxhash64(lit(seed), lit(table), lit(bit), dim), lit(2)) === 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** Sign-LSH bucket id for one table: `bits` sign bits of dot(v, h_i). */
  private def bucketFor(v: Column, seed: Int, table: Int, bits: Int): Column = {
    val bitCols = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x.cast("double") * hyper(seed, table, b, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  final case class LshConfig(tables: Int = 8, bits: Int = 10, seed: Int = 42)

  /** ANN top-k: candidates from any shared (table, bucket), exact cosine
    * re-rank. Output schema matches bruteForceTopK. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cfg: LshConfig = LshConfig()): DataFrame = {
    def withBuckets(df: DataFrame, vecCol: String, idAs: String): DataFrame =
      df.select(col("*"), explode(array((0 until cfg.tables).map { t =>
          struct(lit(t).as("tbl"), bucketFor(col(vecCol), cfg.seed, t, cfg.bits).as("bkt"))
        }: _*)).as("tb"))
        .select(col(idAs), col(vecCol), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))

    val cb = withBuckets(corpus, "embedding", "vec_id")
    val qb = withBuckets(queries, "q_embedding", "query_id")
    val candidates = cb.join(qb, Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("q_embedding"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    candidates
      .withColumn("cos", cosine(col("q_embedding"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold) via LSH
    * blocking — the embedding flavor of Dedup. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double,
      cfg: LshConfig = LshConfig()): DataFrame = {
    def withBuckets(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(s"e_$idAs"),
          explode(array((0 until cfg.tables).map { t =>
            struct(lit(t).as("tbl"),
              bucketFor(col("embedding"), cfg.seed, t, cfg.bits).as("bkt"))
          }: _*)).as("tb"))
        .select(col(idAs), col(s"e_$idAs"), col("tb.tbl").as("tbl"), col("tb.bkt").as("bkt"))
    val a = withBuckets(corpus, "vec_a")
    val b = withBuckets(corpus, "vec_b")
    a.join(b, Seq("tbl", "bkt"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosine(col("e_vec_a"), col("e_vec_b")).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
  }
}
