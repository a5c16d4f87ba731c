package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** DSIR-style data selection via hashed-n-gram importance resampling
  * (Xie et al., NeurIPS 2023, "Data Selection for Language Models via
  * Importance Resampling") — score every document of a RAW corpus by how
  * much its hashed-unigram distribution looks like a TARGET (quality)
  * corpus, then resample top-k under deterministic Gumbel noise.
  *
  * The reference engine (megamind) has no curation layer; this extends the
  * training-data operator suite alongside [[Dedup]]/[[Sampling]].
  *
  * Scale posture (100 TB): the bucket distributions are two full-scan
  * map-side-partial aggregations collapsing to at most `buckets` rows each
  * (tiny, independent of corpus size); the per-bucket log-ratio frame is
  * broadcast, so scoring is one scan of the raw corpus + one hash
  * aggregation keyed by doc id — no corpus-sized join ever shuffles. For a
  * web-scale raw corpus the distributions can be estimated on a
  * deterministic hash-sample (pre-filter the inputs with
  * [[Sampling.splitCell]]-style predicates) without touching this code.
  *
  * Determinism / oracle posture: tokens are lowercased maximal `\S+` runs
  * hashed with the FNV-1a [[TextHash.fingerprint64]] (mirrored bit-for-bit
  * in DuckDB HUGEINT arithmetic); the per-document score is a sum of
  * per-token doubles, so — like the byte-entropy oracle — both engines
  * agree to ~1 ulp and the published value is cast to float32 to absorb
  * the summation-order difference.
  */
object Importance {

  /** `buckets` hashed-unigram bins (the DSIR paper uses 10^4; anything
    * >= ~10x the vocabulary of interest works), add-`alpha` smoothing. */
  final case class DsirConfig(buckets: Int = 1024, alpha: Double = 1.0)

  /** Lowercased whitespace tokens exploded to one row per token with the
    * FNV-1a hash bucket (pmod of the SIGNED 64-bit fingerprint — the same
    * mapping as [[Sampling]]'s split cells, so one oracle technique covers
    * both). explode_outer keeps token-less documents (null bucket) so every
    * input id surfaces in the scored output without a corpus-sized join. */
  private def tokenBuckets(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    docs.select(col(idCol),
        explode_outer(TextStats.tokens(lower(col(textCol))))
          .as("tok"))
      .select(col(idCol), pmod(TextHash.fingerprint64(col("tok")), lit(buckets))
        .as("bucket"))

  /** Per-bucket token counts of one corpus: a full scan collapsing to at
    * most `buckets` rows (partial aggregation does the heavy lifting
    * map-side; the shuffle moves <= buckets rows per mapper). */
  private def bucketCounts(docs: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    tokenBuckets(docs, textCol, idCol, buckets)
      .filter(col("bucket").isNotNull)
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Per-bucket importance log-ratio
    * `ln((ct+a)/(T+aB)) - ln((cr+a)/(R+aB))` as a <= `buckets`-row frame
    * `(bucket, lr)`. The totals fold in as a single-row broadcast
    * nest-loop join (the [[TextStats.topTerms]] corpus-N pattern). */
  private def bucketLogRatios(raw: DataFrame, target: DataFrame,
      textCol: String, idCol: String, cfg: DsirConfig): DataFrame = {
    val tc = bucketCounts(target, textCol, idCol, cfg.buckets)
      .withColumnRenamed("n", "ct")
    val rc = bucketCounts(raw, textCol, idCol, cfg.buckets)
      .withColumnRenamed("n", "cr")
    val joined = tc.join(rc, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = joined.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("rt"))
    val aB = lit(cfg.alpha * cfg.buckets)
    joined.join(totals) // 1-row side => BroadcastNestedLoopJoin, free
      .select(col("bucket"),
        (log(col("ct") + cfg.alpha) - log(col("tt") + aB)
          - log(col("cr") + cfg.alpha) + log(col("rt") + aB)).as("lr"))
  }

  /** Score every `raw` document: `(idCol, n_tokens, dsir_logweight)` where
    * the weight is the summed per-token log importance ratio vs `target`
    * (higher = more target-like). Token-less documents get weight 0.
    * One raw-corpus scan + one hash aggregation on the id; the log-ratio
    * side is always <= `buckets` rows and explicitly broadcast. */
  def dsirWeights(raw: DataFrame, target: DataFrame,
      cfg: DsirConfig = DsirConfig(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ratios = bucketLogRatios(raw, target, textCol, idCol, cfg)
    tokenBuckets(raw, textCol, idCol, cfg.buckets)
      .join(broadcast(ratios), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(col("bucket")).as("n_tokens"),
        coalesce(sum(col("lr")), lit(0.0)).as("w"))
      .select(col(idCol), col("n_tokens"),
        // float32 absorbs the engines' float-sum ordering difference
        col("w").cast("float").as("dsir_logweight"))
  }

  /** Gumbel-top-k resampling with DETERMINISTIC noise: the Gumbel variate
    * is derived from the FNV-1a hash of `"dsir|<id>"` (u in (0,1) from the
    * low 53 bits, g = -ln(-ln(u))), so the draw is a pure function of the
    * id — reproducible across runs, engines and cluster sizes, exactly like
    * the split/stratified samplers. Equivalent to sampling k docs without
    * replacement with probability proportional to exp(w/temperature).
    * TakeOrderedAndProject — never a global sort. */
  def resampleTopK(raw: DataFrame, target: DataFrame, k: Int,
      temperature: Double = 1.0, cfg: DsirConfig = DsirConfig(),
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(temperature > 0, s"temperature must be > 0: $temperature")
    val m = 1L << 53
    val cell = pmod(
      TextHash.fingerprint64(concat(lit("dsir|"), col(idCol).cast("string"))),
      lit(m))
    val u = (cell + lit(1L)).cast("double") / lit((m + 2).toDouble)
    val gumbel = -log(-log(u))
    dsirWeights(raw, target, cfg, textCol, idCol)
      .withColumn("gumbel_key",
        (col("dsir_logweight").cast("double") / temperature + gumbel)
          .cast("float"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
