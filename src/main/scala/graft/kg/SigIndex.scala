package graft.kg

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash band-signature index for the delta Disjoint Resolver.
  *
  * [[Link.fuzzySameAsDelta]] enumerates only new-involved candidate PAIRS,
  * but its per-pass COMPUTE is still O(total): every eligible key is
  * re-shingled + re-minhashed, and the bucket-size cap runs a count window
  * over the full banded frame (rank/bucket state must be globally
  * consistent). At the 10M-turn rehearsal that linear term is the dominant
  * per-trigger cost (BENCH/RESOLVER.md "Identified next step").
  *
  * This index makes discovery O(delta) in compute — the same move as the
  * persisted IVF index ([[graft.ops.Similarity.buildIvfIndex]]):
  *
  *  - band signatures live in a [[Materialize]] table keyed by
  *    `(entity_type, key, band)`; each pass bands ONLY the new keys and
  *    appends them (O(delta) CPU + write);
  *  - bucket sizes are re-derived per pass by a partial aggregation over the
  *    persisted frame — a distinct-bucket-sized shuffle after map-side
  *    combine, instead of a count window shuffling every row with its key
  *    string. Identical cap semantics to the window (global counts each
  *    pass, so indexed output == [[Link.fuzzySameAsDelta]] exactly);
  *  - oversized buckets are excluded from BOTH join sides by an anti-join
  *    against the (structurally tiny, ≤ rows/maxBandBucket) oversized-bucket
  *    list, broadcast when measured small — the big side never shuffles for
  *    the cap;
  *  - candidate pairs come from one equi-join: fresh-banded (delta) ×
  *    persisted (all), pair order normalized with least/greatest — covers
  *    exactly the new-involved pairs, old×old never enumerated;
  *  - merged-away keys are deleted by RE-DERIVING their band rows
  *    ([[Link.bandSignature]] is a pure function of the key) into an
  *    equality-delete tombstone — O(removed) compute, no table scan.
  *
  * Consistency guards (both self-healing — a failed guard rebuilds the
  * index from the full key set, it never returns stale candidates):
  *  - `_CONFIG` pins the signature-shaping config (numHashes|bands); a
  *    change invalidates every stored row;
  *  - a key-set fingerprint (`bit_xor(xxhash64(type, key))` + count over the
  *    band-0 rows — one row per key by construction) is compared against
  *    the caller's old-key set each pass, so an index that drifted (e.g. a
  *    resolve ran with the index disabled in between) is detected instead
  *    of silently losing candidates.
  *
  * Reference anchor: megamind's Disjoint Watcher reacts to individual
  * (TUID, GUID) events and keeps resolver state between wakes
  * (`docs/diagrams/megamind.drawio:80-113`); the persisted signature table is
  * that state in columnar form.
  */
object SigIndex {

  /** What one indexed discovery pass did (test/metrics surface). */
  final case class Stats(bandedKeys: Long, rebuilt: Boolean)

  private def bandsTable(dir: String) = s"$dir/bands"
  private def cfgPath(dir: String) = Paths.get(dir, "_CONFIG")
  private val tableKey = Seq("entity_type", "key", "band")

  /** Only the fields that shape STORED rows. A threshold or bucket-cap
    * change does not invalidate persisted signatures (caps and verification
    * are applied at read time). */
  private def bandCfgSig(cfg: Link.Config): String =
    s"${cfg.numHashes}|${cfg.bands}"

  private def bandRows(spark: SparkSession, keys: DataFrame,
      cfg: Link.Config): DataFrame = {
    import spark.implicits._
    val (nh, nb) = (cfg.numHashes, cfg.bands)
    keys.select($"entity_type", $"dict_key").as[(String, String)]
      .flatMap { case (et, k) =>
        Link.bandSignature(k, nh, nb).map { case (b, h) => (et, k, b, h) }
      }.toDF("entity_type", "key", "band", "band_hash")
  }

  /** Delta same-as discovery backed by the persisted index. Equivalent to
    * `Link.fuzzySameAsDelta(flagged, cfg)` (LSH path) when the old-key
    * invariant holds; `rebuild = true` (first resolve / config change — the
    * caller's full-rediscovery condition) replaces the index wholesale.
    *
    * Returns the verified same-as frame, a cleanup freeing this pass's
    * eager checkpoints (call after the result is materialized — looped
    * callers otherwise accumulate block-manager state), and [[Stats]]
    * (`bandedKeys` proves the O(delta) claim per pass).
    */
  def fuzzySameAsIndexed(spark: SparkSession, dir: String, flagged: DataFrame,
      cfg: Link.Config, rebuild: Boolean): (DataFrame, () => Unit, Stats) = {
    import spark.implicits._
    require(!cfg.exactSameAs,
      "SigIndex backs the MinHash/LSH path; the exact PPJoin path has no persisted signatures")
    val table = bandsTable(dir)
    // same key collapse as Link.sameAsImpl: a key seen both new and old is
    // old (already resolved; only needs to be discoverable as a partner)
    val eligible = flagged.filter($"entity_type".isin(cfg.fuzzyTypes: _*))
      .groupBy($"entity_type", $"dict_key").agg(min($"is_new").as("is_new"))
      .localCheckpoint(eager = true)

    val sig = bandCfgSig(cfg)
    val sigOk = Files.exists(cfgPath(dir)) &&
      Files.readString(cfgPath(dir)).trim == sig &&
      Materialize.currentManifest(table).isDefined

    // fingerprint the OLD key set vs the persisted key set (band-0 rows are
    // one-per-key by construction — no distinct shuffle needed)
    def fingerprint(df: DataFrame, keyCol: String): (Long, Long) = {
      val r = df.agg(
        coalesce(bit_xor(xxhash64(col("entity_type"), col(keyCol))), lit(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val inSync = !rebuild && sigOk && {
      val idxKeys = Materialize.readTable(spark, table).get
        .filter($"band" === 0).select($"entity_type", $"key")
      fingerprint(idxKeys, "key") ==
        fingerprint(eligible.filter(!$"is_new"), "dict_key")
    }

    val toBand = if (inSync) eligible.filter($"is_new") else eligible
    val fresh = bandRows(spark, toBand, cfg).localCheckpoint(eager = true)
    val bandedKeys = fresh.count() / cfg.bands
    if (inSync)
      // pipeline emits key-distinct rows (eligible is a groupBy output,
      // bands are distinct per key) — skip the staged dedup shuffle
      Materialize.appendDelta(spark, table, fresh, tableKey, dedupStaged = false)
    else {
      Files.createDirectories(Paths.get(dir))
      Materialize.mergeSnapshot(spark, table, fresh, tableKey, replace = true)
      Files.writeString(cfgPath(dir), sig)
    }
    // full banded frame, including the rows just appended; checkpointed so
    // the bucket-count agg and the pair join share one merge-on-read pass
    val all = Materialize.readTable(spark, table).get.localCheckpoint(eager = true)

    // global bucket sizes by partial agg (map-side combine -> the shuffle
    // carries distinct buckets, not rows); drops observed like link.lsh
    val bucketCounts = all.groupBy($"entity_type", $"band", $"band_hash")
      .agg(count(lit(1)).as("bucket_n"))
    val observed = graft.ops.CapMetrics.observed(bucketCounts, "link.lsh.idx",
      sum(when($"bucket_n" > cfg.maxBandBucket, $"bucket_n").otherwise(0L))
        .as("dropped_rows"),
      max($"bucket_n").as("max_bucket"))
    val over = graft.ops.CapMetrics.checkpointHarvest(
      observed.filter($"bucket_n" > cfg.maxBandBucket)
        .select($"entity_type", $"band", $"band_hash"))
    // the oversized list is structurally ≤ rows/maxBandBucket long; hint
    // broadcast only when measured small (an explicit hint is never demoted).
    // 1.5M (entity_type, band, hash) rows ≈ the ~180 MB broadcast relation
    // Link.Config's registry gates document as the measured comfort point —
    // beyond that, let the anti-join shuffle rather than risk executor OOM
    val overSmall = over.count() <= 1500000L
    def capped(df: DataFrame): DataFrame =
      df.join(if (overSmall) broadcast(over) else over,
        Seq("entity_type", "band", "band_hash"), "left_anti")

    val pairs = capped(fresh).as("a")
      .join(capped(all).as("b"),
        $"a.entity_type" === $"b.entity_type" && $"a.band" === $"b.band" &&
          $"a.band_hash" === $"b.band_hash" && $"a.key" =!= $"b.key")
      .select($"a.entity_type".as("entity_type"),
        least($"a.key", $"b.key").as("key_a"),
        greatest($"a.key", $"b.key").as("key_b"))
      .distinct()

    val verify = udf((x: String, y: String) => Link.jaccard(x, y))
    (pairs.filter(verify($"key_a", $"key_b") >= cfg.jaccardThreshold),
      () => { all.unpersist(); fresh.unpersist(); over.unpersist()
        eligible.unpersist(); () },
      Stats(bandedKeys, !inSync))
  }

  /** Delete `removedKeys` (entity_type, dict_key — merged-away names) from
    * the index. Their band rows are RE-DERIVED (the signature is a pure
    * function of the key under a pinned config), not scanned: O(removed)
    * compute, one equality-delete tombstone write. No-op when the index
    * does not exist or was built under a different signature config (the
    * next discovery rebuilds it anyway). */
  def remove(spark: SparkSession, dir: String, removedKeys: DataFrame,
      cfg: Link.Config): Unit = {
    if (!Files.exists(cfgPath(dir)) ||
        Files.readString(cfgPath(dir)).trim != bandCfgSig(cfg) ||
        Materialize.currentManifest(bandsTable(dir)).isEmpty) return
    val rows = bandRows(spark, removedKeys, cfg)
    Materialize.appendRewrite(spark, bandsTable(dir),
      rows.limit(0), rows.select(tableKey.map(col): _*), tableKey)
  }
}
