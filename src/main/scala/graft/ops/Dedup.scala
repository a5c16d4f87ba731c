package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Deduplication operators for a training-data pipeline, over
  * `documents(doc_id, text, ...)`.
  *
  * Scale posture: every variant is blocking-based — candidates meet only
  * inside a (small) equi-join key group, so the shuffle is keyed by block,
  * never all-pairs. Exact dedup is one hash aggregate; MinHash and SimHash
  * blocks are bounded by band/chunk width; verification runs only on
  * candidate pairs.
  *
  * Signature computation runs in JVM kernels (mapPartitions-style flatMap /
  * UDF): Spark's higher-order array functions are interpreted
  * (CodegenFallback) and measured ~1000x slower per element on exactly this
  * workload (443 s → seconds for the sf0.1 minhash bench query).
  */
object Dedup {

  /** Exact dedup by content hash: one representative (min doc_id) per
    * distinct text; `dup_count` = group size. Single hash-agg shuffle with
    * map-side partial aggregation. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("text_md5"))
      .groupBy(col("text_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))

  // ---- kernels ---------------------------------------------------------------

  /** Normalized word n-gram shingle set. */
  def wordShinglesKernel(text: String, n: Int): Set[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) toks.toSet
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  def jaccardKernel(a: Set[String], b: Set[String]): Double = {
    val inter = a.intersect(b).size
    if (inter == 0) 0.0 else inter.toDouble / (a.size + b.size - inter)
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Banded MinHash signature of a shingle set: `bands` (band, hash) keys. */
  def bandHashKernel(shingles: Set[String], numHashes: Int, bands: Int): Seq[(Int, Long)] = {
    val rows = numHashes / bands
    val mins = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val h0 = scala.util.hashing.MurmurHash3.stringHash(s, 0x2f7e1b3c).toLong & 0xffffffffL
      var i = 0
      while (i < numHashes) {
        val v = splitmix64(h0 ^ (i.toLong * 0xA24BAED4963EE407L))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    (0 until bands).map { b =>
      var acc = 1125899906842597L
      var r = 0
      while (r < rows) { acc = acc * 31 + mins(b * rows + r); r += 1 }
      (b, acc)
    }
  }

  final case class MinHashConfig(numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3, jaccardThreshold: Double = 0.8)

  /** Near-duplicate pairs via MinHash+LSH blocking, verified with exact
    * shingle-set Jaccard. Returns (doc_a, doc_b, jaccard), doc_a < doc_b.
    *
    * Plan shape: signature flatMap (one pass over text, checkpointed — it
    * feeds both self-join sides) → equi-join on (band, band_hash) →
    * distinct candidate pairs (tiny) → join back to text → exact verify.
    */
  def minhashPairs(docs: DataFrame, cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val sigs = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        bandHashKernel(wordShinglesKernel(if (text == null) "" else text, cfg.shingleN),
          cfg.numHashes, cfg.bands).map { case (b, h) => (id, b, h) }
      }
      .toDF("doc_id", "band", "band_hash")
      .localCheckpoint(eager = true)

    val a = sigs.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    val verifyUdf = udf((ta: String, tb: String) =>
      jaccardKernel(wordShinglesKernel(ta, cfg.shingleN), wordShinglesKernel(tb, cfg.shingleN)))
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    candidates
      .join(ta, Seq("doc_a")).join(tb, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        verifyUdf(col("text_a"), col("text_b")).as("jaccard"))
      .filter(col("jaccard") >= cfg.jaccardThreshold)
  }

  /** N-gram Jaccard similarity for candidate pairs inside LSH blocks — a
    * lighter screen (fewer hashes, lower threshold) for similarity analytics
    * rather than dedup decisions. */
  def ngramJaccardPairs(docs: DataFrame, shingleN: Int = 3,
      minJaccard: Double = 0.5): DataFrame =
    minhashPairs(docs, MinHashConfig(numHashes = 16, bands = 8,
      shingleN = shingleN, jaccardThreshold = minJaccard))

  /** SimHash near-dup pairs: 64-bit simhash (native codegen'd expression),
    * blocked by `chunks` equal bit-slices — pigeonhole guarantees any pair
    * with Hamming distance < chunks shares at least one exact slice — then
    * verified with bit_count(xor) ≤ maxHamming. More chunks = higher recall
    * bound but coarser (hotter) buckets; the default (4 × 16-bit) is the
    * scale setting for ham ≤ 3. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, chunks: Int = 4): DataFrame = {
    require(64 % chunks == 0 && chunks > maxHamming,
      s"need 64 % chunks == 0 and chunks > maxHamming; got chunks=$chunks maxHamming=$maxHamming")
    val bits = 64 / chunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    val sh = docs.select(col("doc_id"), TextHash.simhash64(col("text")).as("simhash"))
      .localCheckpoint(eager = true) // feeds both self-join sides
    val chunked = sh.select(col("doc_id"), col("simhash"),
        explode(array((0 until chunks).map { i =>
          struct(lit(i).as("chunk_idx"),
            shiftrightunsigned(col("simhash"), i * bits).bitwiseAND(lit(mask))
              .as("chunk_val"))
        }: _*)).as("c"))
      .select(col("doc_id"), col("simhash"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk_val").as("chunk_val"))
    val a = chunked.select(col("doc_id").as("doc_a"), col("simhash").as("h_a"),
      col("chunk_idx"), col("chunk_val"))
    val b = chunked.select(col("doc_id").as("doc_b"), col("simhash").as("h_b"),
      col("chunk_idx"), col("chunk_val"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cluster near-dup pairs into groups (connected components) and pick one
    * representative per group — composes with graft.kg.Canonicalize. */
  def dedupGroups(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(lit("doc").as("entity_type"),
      col("doc_a").cast("string").as("key_a"), col("doc_b").cast("string").as("key_b"))
    graft.kg.Canonicalize.connectedComponents(edges)
      .select(col("key").cast("long").as("doc_id"),
        col("component").cast("long").as("group_rep"))
  }
}
