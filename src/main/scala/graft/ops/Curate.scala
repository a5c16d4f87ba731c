package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call corpus curation: composes the individually-oracle-checked
  * training-data filters into a single per-document DECISION TABLE —
  * the judgment a pipeline needs before packing shards, with every stage's
  * verdict kept as its own column so a drop is always attributable:
  *
  *   - `keep_exact`      min-doc_id representative per identical text
  *                       ([[Dedup.exact]] semantics, computed as a window
  *                       over the content-hash shuffle — no join back)
  *   - `keep_neardup`    not a non-representative member of a near-dup
  *                       group ([[Dedup.ngramJaccardPairs]] →
  *                       [[Dedup.dedupGroups]] connected components)
  *   - `clean_contam`    zero shingles shared with the benchmark set
  *                       ([[Contamination.flagContaminated]])
  *   - `pass_quality`    length / punctuation / token-diversity gates over
  *                       [[TextStats.quality]] signals
  *   - `pass_repetition` Gopher-style repetition gates over
  *                       [[TextStats.repetitionStats]] signals
  *   - `kept`            the conjunction
  *
  * Input contract matches the text ops: `docs(doc_id, text)` (plus a
  * benchmark frame of the same shape). Output: one row per doc —
  * `(doc_id, n_tokens, keep_exact, keep_neardup, clean_contam,
  * pass_quality, pass_repetition, kept)`.
  *
  * Every gate compares exact-rational doubles (integer-over-integer IEEE
  * divisions, proven bit-identical across engines by the component
  * oracles), so the boolean columns are engine-reproducible and the whole
  * table has an exact DuckDB oracle (`q_curate`).
  *
  * Scale posture (100 TB): the corpus is scanned once per signal family
  * (quality, repetition, shingles, hash) — scan-bound map work that is
  * NEVER worth checkpointing at corpus scale — while everything that
  * aggregates is the component ops' audited shapes (capped banded
  * similarity join, size-gated benchmark broadcast, content-hash window);
  * the final assembly is doc-keyed equi-joins that AQE plans off the same
  * doc_id hash partitioning. The near-dup and contamination internals are
  * the SEALED variants, so no corpus-scale checkpoint outlives the call.
  */
object Curate {

  /** Gate thresholds. Defaults give a mixed keep/drop verdict on ordinary
    * web-ish text (and on the repo fixtures — every flag exercises both
    * outcomes in the specs). */
  final case class Config(
      neardupShingleN: Int = 3,
      minJaccard: Double = 0.5,
      contamShingleN: Int = 4,
      minTokens: Long = 15L,
      maxPunctRatio: Double = 0.2,
      minDistinctRatio: Double = 0.35,
      maxDupWordFrac: Double = 0.65,
      maxTopBigramFrac: Double = 0.08,
      maxDupTrigramFrac: Double = 0.01)

  def curate(docs: DataFrame, benchmark: DataFrame,
      cfg: Config = Config()): DataFrame = {
    // exact-dup keep: min id per identical content — one window over the
    // hash shuffle (same keep rule as Dedup.exact, without the join back)
    val exW = Window.partitionBy(col("__md5"))
    val exact = docs
      .select(col("doc_id"), md5(col("text")).as("__md5"))
      .withColumn("keep_exact", col("doc_id") === min(col("doc_id")).over(exW))
      .select(col("doc_id"), col("keep_exact"))

    // near-dup groups (docs absent from any pair are their own reps)
    val groups = Dedup.dedupGroups(Dedup.ngramJaccardPairs(docs,
      cfg.neardupShingleN, cfg.minJaccard))

    val contam = Contamination.flagContaminated(docs, benchmark,
      cfg.contamShingleN)

    val qual = TextStats.quality(docs)
      .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
        col("distinct_ratio"))
    val rep = TextStats.repetitionStats(docs)
      .select(col("doc_id"), col("dup_word_frac"), col("top_bigram_frac"),
        col("dup_trigram_frac"))

    val keepNeardup = col("group_rep").isNull || col("group_rep") === col("doc_id")
    val cleanContam = col("n_hits") === 0L
    val passQuality = col("n_tokens") >= cfg.minTokens &&
      col("punct_ratio") <= cfg.maxPunctRatio &&
      col("distinct_ratio") >= cfg.minDistinctRatio
    val passRepetition = col("dup_word_frac") <= cfg.maxDupWordFrac &&
      col("top_bigram_frac") <= cfg.maxTopBigramFrac &&
      col("dup_trigram_frac") <= cfg.maxDupTrigramFrac

    qual
      .join(rep, Seq("doc_id"))
      .join(exact, Seq("doc_id"))
      .join(groups, Seq("doc_id"), "left")
      .join(contam.select(col("doc_id"), col("n_hits")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("keep_exact"),
        keepNeardup.as("keep_neardup"),
        cleanContam.as("clean_contam"),
        passQuality.as("pass_quality"),
        passRepetition.as("pass_repetition"),
        (col("keep_exact") && keepNeardup && cleanContam && passQuality &&
          passRepetition).as("kept"))
  }
}
