package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  */
object Dedup {

  /** Exact dedup by content hash: one representative (min doc_id) per
    * distinct text; `dup_count` = group size. Single hash-agg shuffle with
    * map-side partial aggregation. */
  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("text_md5"))
      .groupBy(col("text_md5"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("dup_count"))

  /** Normalized word-3-gram shingle array (distinct, as strings). */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = TextStats.tokens(lower(text))
    // sliding n-grams via transform over index range; filter the ragged tail
    array_distinct(filter(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")),
      s => length(s) > 0))
  }

  final case class MinHashConfig(numHashes: Int = 32, bands: Int = 8,
      shingleN: Int = 3, jaccardThreshold: Double = 0.8)

  /** MinHash signature column: array of `numHashes` min-hash values over the
    * shingle array — pure column expressions (xxhash64 per shingle per seed),
    * codegen-friendly, no UDF. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shingles, s => xxhash64(s, seed))))

  /** Banded LSH buckets: (band_idx, band_hash) pairs from the signature. */
  def bandBuckets(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(array_join(slice(sig, b * rows + 1, lit(rows)), ",")).as("band_hash")))
  }

  /** Near-duplicate pairs via MinHash+LSH blocking, verified with exact
    * shingle-set Jaccard. Returns (doc_a, doc_b, jaccard), doc_a < doc_b. */
  def minhashPairs(docs: DataFrame, cfg: MinHashConfig = MinHashConfig()): DataFrame = {
    val withSig = docs.select(col("doc_id"),
        wordShingles(col("text"), cfg.shingleN).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), cfg.numHashes))
      .withColumn("bucket", explode(bandBuckets(col("sig"), cfg.numHashes, cfg.bands)))
      .select(col("doc_id"), col("shingles"),
        col("bucket.band").as("band"), col("bucket.band_hash").as("band_hash"))

    val a = withSig.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"),
      col("band"), col("band_hash"))
    val b = withSig.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"),
      col("band"), col("band_hash"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val uni = size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), (inter / uni).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= cfg.jaccardThreshold)
  }

  /** N-gram Jaccard similarity for ALL candidate pairs inside cheap blocks
    * (first band only — a lighter-weight screen than minhashPairs, for
    * similarity analytics rather than dedup decisions). */
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
