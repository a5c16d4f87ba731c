package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Model._

/** S2 — conversation reconstruction: replay dedup + stable turn ordering.
  *
  * The reference accepts at-least-once delivery (fire-and-forget publish,
  * `services/ingest/ingest/ingest.go:49-59`) and removes duplicates
  * downstream (`docs/diagrams/megamind.drawio:103`). The Spark analog: the
  * transcript table may contain replayed `(conv_id, turn_idx)` rows; we keep
  * exactly one row per key, chosen by a deterministic total order
  * (ts, role, tool, text) so reruns and input-row permutations produce
  * byte-identical output — the per-row invariant "per-turn text equality
  * under stable turn ordering" (BASELINE.json input_hint).
  *
  * Scale notes: one shuffle on conv_id; no `collect_list` of whole
  * conversations (a hot conversation would blow executor memory at 10^12
  * turns) — downstream stages consume turns row-wise and reuse this
  * partitioning for their conversation windows, so S2+S3 cost a single
  * exchange. Conv-id skew is NOT salted here (a window cannot span salt
  * splits); skew within the window stage is bounded because per-turn work is
  * O(1), and AQE handles post-shuffle partition imbalance.
  */
object Reconstruct {

  /** Deduplicate replays; result is one row per (conv_id, turn_idx).
    *
    * Implemented with a window partitioned by `conv_id` ONLY (ordered by the
    * full deterministic key, keeping the first row of each `turn_idx` run)
    * rather than by `(conv_id, turn_idx)`: downstream extraction windows
    * also partition by `conv_id`, so Catalyst reuses this exchange and sort —
    * reconstruction + extraction cost a single shuffle total (visible as one
    * Exchange in the physical plan). */
  def apply(turns: Dataset[Turn]): Dataset[Turn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"conv_id")
      .orderBy($"turn_idx".asc, $"ts".asc, $"role".asc, $"tool".asc, $"text".asc)
    turns
      .withColumn("__prev_idx", lag($"turn_idx", 1).over(w))
      .filter($"__prev_idx".isNull || $"__prev_idx" =!= $"turn_idx")
      .drop("__prev_idx")
      .as[Turn]
  }
}
