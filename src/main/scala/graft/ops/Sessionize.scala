package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the classic
  * training-data / clickstream operator: events of one user belong to the
  * same session while consecutive gaps stay within `gapMs`.
  *
  * Plan shape: ONE shuffle (window partition by user), two window
  * functions sharing it (lag for the gap flag, running sum for the session
  * index), then a hash aggregate that reuses the same partitioning — no
  * second exchange. Deterministic: ordering ties broken by `event_id`.
  */
object Sessionize {

  /** Per-event session assignment: adds `session_idx` (1-based per user). */
  def assign(events: DataFrame, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // cast handles TIMESTAMP_NTZ sources (session tz is UTC in all mains)
    val tsMs = unix_millis(col("ts").cast("timestamp"))
    val prevMs = lag(tsMs, 1).over(w)
    val brk = when(prevMs.isNull || (tsMs - prevMs) > gapMs, 1L).otherwise(0L)
    events
      .withColumn("brk", brk)
      .withColumn("session_idx", sum(col("brk")).over(w).cast("int"))
      .drop("brk")
  }

  /** Per-session rollup: (user_id, session_idx, n_events, start_ts, end_ts). */
  def sessions(events: DataFrame, gapMs: Long): DataFrame =
    assign(events, gapMs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"))
}
