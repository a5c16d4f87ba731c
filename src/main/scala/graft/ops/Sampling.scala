package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Deterministic dataset splitting for training pipelines.
  *
  * Train/val/test assignment must be a PURE FUNCTION of a stable record key
  * — not `rand()` (changes across runs/retries/partitions) and not
  * Spark-internal hashing (engine-specific) — so that re-runs, incremental
  * appends, and other engines (the DuckDB oracle re-derives the same
  * assignment) agree on every row's split forever. We bucket the FNV-1a
  * fingerprint of the key's decimal string into 100 cells: cells
  * [0, trainPct) are train, [trainPct, trainPct+valPct) val, rest test.
  * Zero shuffles — a per-row codegen'd projection.
  */
object Sampling {

  def assignSplit(df: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct+valPct < 100; got $trainPct/$valPct")
    val cell = pmod(TextHash.fingerprint64(col(idCol).cast("string")), lit(100L))
    df.withColumn("split_cell", cell.cast("int"))
      .withColumn("split",
        when(col("split_cell") < trainPct, "train")
          .when(col("split_cell") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic STRATIFIED sampling: keep a row iff
    * `pmod(fnv1a("<stratum>|<key>"), 10^6) < round(fraction(stratum)*10^6)`
    * — per-stratum rates (curation mixes: oversample rare sources,
    * downsample boilerplate-heavy ones) as a pure function of
    * (stratum, key). Same engine-portability contract as [[assignSplit]]:
    * rerun/append-stable, re-derivable by any engine, zero shuffles (a
    * codegen'd projection + filter — never `df.sampleBy`, whose
    * Bernoulli draw changes across runs and partitionings). The stratum
    * salts the hash, so the SAME key is an independent draw in different
    * strata. `sample_cell` is kept in the output for auditability. A null
    * stratum (or null key) is sampled at `defaultFraction`, hashing as the
    * empty string — a corpus with BOTH null and "" strata draws them from
    * the same cells. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions in [0,1]; got $fractions default=$defaultFraction")
    def thresholdOf(f: Double): Long = math.round(f * 1000000.0)
    // null-safe: a null stratum (or null key) must fall under
    // defaultFraction like any unlisted stratum, not vanish because
    // concat(null, ...) nulls the hash and `NULL < t` filters everything out
    val strata = coalesce(col(strataCol).cast("string"), lit(""))
    val key = coalesce(col(idCol).cast("string"), lit(""))
    val cell = pmod(TextHash.fingerprint64(
      concat(strata, lit("|"), key)), lit(1000000L))
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(thresholdOf(defaultFraction)): org.apache.spark.sql.Column) {
      case (acc, (s, f)) => when(strata === s, lit(thresholdOf(f))).otherwise(acc)
    }
    df.withColumn("sample_cell", cell)
      .filter(col("sample_cell") < threshold)
  }
}
