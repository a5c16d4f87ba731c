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
}
