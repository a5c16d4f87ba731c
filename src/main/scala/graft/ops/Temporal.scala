package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — the two classical time-series operators Spark has no
  * native node for, each expressed so Catalyst never falls back to a
  * BroadcastNestedLoopJoin / cartesian product:
  *
  *  - [[asofJoin]]: backward as-of (each left row picks the most recent
  *    right row with the same key and `right.ts <= left.ts`) as a tagged
  *    UNION + ONE window pass — no join node at all, one shuffle on the key,
  *    O(n log n) per partition. The classic alternative (range-condition
  *    join) is quadratic per key in Spark.
  *  - [[rangeJoin]]: point-in-interval join via time bucketization — each
  *    interval explodes into the fixed-width buckets it covers, each point
  *    lands in exactly one bucket, and the join is a plain EQUI-join on
  *    (key, bucket) + an exact residual filter. Each qualifying pair is
  *    emitted exactly once (a point has one bucket; an interval covers it
  *    once), so no distinct is needed afterwards.
  *
  * At 100 TB both shapes hold: the as-of union shuffles each side once on
  * the key (skew = one hot key's history in one partition — same exposure
  * as any window op, salt upstream if a single key exceeds a partition);
  * the range join's fan-out is bounded by `maxBucketsPerInterval` and
  * enforced with a hard per-row error, never a silent drop, because a
  * mis-sized bucket width silently multiplying the probe side 1000× is the
  * classic range-join scale accident.
  */
object Temporal {

  /** Backward as-of join.
    *
    * For every `left` row, attaches `payloadCols` from the single `right`
    * row with equal `keys`, `right(tsCol) <= left(tsCol)`, maximal
    * `right(tsCol)`, ties broken by maximal `right(tieCol)` (pass a unique
    * id column; ties among identical (key, ts, tie) right rows are
    * undefined). Left rows with no qualifying right row get nulls.
    *
    * Plan: tag each side, union, ONE window (partition by key, order by
    * (ts, side, tie) with rights sorted before lefts at equal ts so the
    * bound is inclusive), `last(payload struct, ignoreNulls)` over an
    * unbounded-preceding frame — the payload rides as a single struct so
    * all columns always come from the SAME right row even when individual
    * payload values are null — then filter back to left rows. Output: every
    * `left` column plus `prefix + payloadCol` for each payload column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(payloadCols.nonEmpty, "asofJoin needs at least one payload column")
    val lCols = left.columns.toSeq
    require(!lCols.exists(_.startsWith("__asof_")),
      "asofJoin: left side may not contain __asof_* columns")
    val lRest = lCols.filterNot(keys.contains)
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType

    val rightU = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__asof_ts"),
        lit(0).as("__asof_side"),
        col(tieCol).cast("long").as("__asof_tie"),
        payloadStruct.as("__asof_payload")) ++
      lRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftU = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__asof_ts"),
        lit(1).as("__asof_side"),
        lit(0L).as("__asof_tie"),
        lit(null).cast(payloadType).as("__asof_payload")) ++
      lRest.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc, col("__asof_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightU.unionByName(leftU)
      .withColumn("__asof_hit", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)
      .select(lCols.map(col) ++
        payloadCols.map(p => col(s"__asof_hit.$p").as(s"$prefix$p")): _*)
  }

  /** Point-in-interval range join (both bounds inclusive).
    *
    * Joins every `points` row to every `intervals` row with equal `keys`
    * and `lo <= ts <= hi`, via `bucketMs`-wide time buckets: intervals
    * explode into their covered buckets, points take their single bucket,
    * and the pair set comes out of an equi-join on (keys..., bucket) plus
    * the exact residual filter. Pick `bucketMs` near the typical interval
    * width — fan-out is `ceil(width / bucketMs) + 1` rows per interval.
    *
    * Intervals spanning more than `maxBucketsPerInterval` buckets throw at
    * run time (assert_true evaluated per interval row — a hard error, not a
    * silent cap: unlike the similarity buckets, dropping an interval would
    * silently lose OUTPUT rows, not just recall on a best-effort candidate
    * set). Output: all point columns, then the interval's non-key columns
    * (names must not collide with point columns).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      tsCol: String, loCol: String, hiCol: String, bucketMs: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one key column")
    require(bucketMs > 0, "rangeJoin needs a positive bucket width")
    val iRest = intervals.columns.toSeq.filterNot(keys.contains)
    val collide = iRest.toSet.intersect(points.columns.toSet)
    require(collide.isEmpty,
      s"rangeJoin: interval columns ${collide.mkString(",")} collide with point columns")
    require(!(points.columns ++ intervals.columns).exists(_.startsWith("__rj_")),
      "rangeJoin: inputs may not contain __rj_* columns")

    // floor(ms / bucketMs) in exact decimal arithmetic (a double divide
    // truncates toward zero, which is NOT floor for pre-epoch timestamps)
    def bucketOf(c: Column): Column =
      floor(unix_millis(c.cast("timestamp")).cast("decimal(20,0)") / lit(bucketMs))
        .cast("long")

    val p = points.withColumn("__rj_bucket", bucketOf(col(tsCol)))
    // assert_true returns NULL when the guard holds; folding it into the
    // sequence bound (coalesce(null-cast, 0)) forces per-row evaluation —
    // a free-standing unused column would be pruned by the optimizer.
    val lo = bucketOf(col(loCol))
    val hi = bucketOf(col(hiCol))
    val guard = assert_true(hi - lo < lit(maxBucketsPerInterval.toLong),
      lit(s"rangeJoin: an interval spans >= $maxBucketsPerInterval buckets of " +
        s"$bucketMs ms — raise bucketMs or maxBucketsPerInterval"))
    val i = intervals
      .withColumn("__rj_bucket",
        explode(sequence(lo, hi + coalesce(guard.cast("long"), lit(0L)))))
    val pa = p.alias("__rj_p")
    val ia = i.alias("__rj_i")
    val cond = (keys :+ "__rj_bucket")
      .map(k => col(s"__rj_p.$k") === col(s"__rj_i.$k"))
      .reduce(_ && _)
    pa.join(ia, cond)
      .filter(col(s"__rj_p.$tsCol") >= col(s"__rj_i.$loCol") &&
        col(s"__rj_p.$tsCol") <= col(s"__rj_i.$hiCol"))
      .select(points.columns.toSeq.map(c => col(s"__rj_p.$c")) ++
        iRest.map(c => col(s"__rj_i.$c")): _*)
  }
}
