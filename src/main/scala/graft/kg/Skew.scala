package graft.kg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9 — skew handling (north rule: "handle conv_id skew via salted
  * repartitioning and AQE skew-join splitting").
  *
  * Three complementary mechanisms, applied where they are safe:
  *
  *  1. '''AQE skew-join splitting''' — set by every entry point
  *     (`spark.sql.adaptive.skewJoin.enabled=true`): oversized join
  *     partitions are split at runtime. This is the default defense for the
  *     linking joins (S4/S5).
  *  2. '''Broadcast of the hot side''' — the hot-entity dictionary is
  *     broadcast (Link tier 2), so the most skewed keys never shuffle at all.
  *  3. '''Salted two-phase aggregation''' ([[Skew.saltedAgg]]) — for
  *     aggregations whose grouping key is skewed (one conversation with 10^8
  *     turns): group first on (key, salt) for partial results, then on key.
  *     NOT applied to the conversation window itself: a stable per-`conv_id`
  *     ordering cannot be split across salt buckets without breaking the
  *     cross-turn extraction semantics (SURVEY §7.5); per-turn work is O(1),
  *     so a hot conversation costs linear scan time inside one task, and the
  *     rows-per-partition imbalance is bounded by AQE rebalancing.
  */
object Skew {

  /** Deterministic salt column in [0, buckets). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Skew-safe count per key: two-phase (key, salt) → key aggregation. */
  def saltedCount(df: DataFrame, key: Column, buckets: Int = 16): DataFrame = {
    val salted = df.groupBy(key.as("k"), salt(buckets, df.columns.map(col): _*).as("s"))
      .agg(count(lit(1)).as("partial"))
    salted.groupBy(col("k")).agg(sum(col("partial")).as("cnt"))
  }

  /** Generic skew-safe aggregation: partial aggregate on (key, salt), final
    * combine on key. `partial` builds the per-salt aggregate columns;
    * `combine` merges them. */
  def saltedAgg(df: DataFrame, key: Seq[Column], saltCols: Seq[Column], buckets: Int)(
      partial: Seq[(Column, String)], combine: Seq[(Column, String)]): DataFrame = {
    val p = df.groupBy((key :+ salt(buckets, saltCols: _*).as("__salt")): _*)
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    p.groupBy(key: _*)
      .agg(combine.head._1.as(combine.head._2),
        combine.tail.map { case (c, n) => c.as(n) }: _*)
  }

  /** Per-partition row-count stats — the `_metrics` skew probe (SURVEY
    * §5.2#5): max/median rows per partition after a given partitioning. */
  def partitionStats(df: DataFrame): (Long, Long, Int) = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.mapPartitions(it => Iterator.single(it.size.toLong))(
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    if (counts.isEmpty) (0L, 0L, 0)
    else (counts.last, counts(counts.length / 2), counts.length)
  }
}
