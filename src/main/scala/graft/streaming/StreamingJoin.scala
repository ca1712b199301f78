package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the Structured Streaming twin of
  * `AsOfJoin.intervalJoin` (batch query `q_interval_join`, DuckDB
  * oracle-checked). Joins two event streams on an equi-key plus an
  * event-time range: a click joins a view by the same user when it
  * lands within `windowSec` after the view.
  *
  * State-bounding is the whole design: BOTH sides carry a watermark and
  * the join condition bounds each side's event time relative to the
  * other (`b_ts ∈ [a_ts, a_ts + windowSec]`), which is exactly what
  * Spark's stream-stream join needs to evict state — a view older than
  * `watermark + windowSec` can never match a future click, so its row
  * leaves the join state. Without the two-sided bound the state grows
  * without limit; with it, steady-state memory is
  * O(rate × (watermarkDelay + windowSec)) per executor, independent of
  * stream lifetime — the shape that survives an unbounded 100 TB/day
  * feed. Inner join: a result row is emitted once, when both sides have
  * arrived (append mode).
  *
  * StreamingJoinSpec drives both sides through MemoryStreams and
  * asserts the streamed result set equals the batch twin on the same
  * rows, including that a click beyond the window joins nothing.
  */
object StreamingJoin {

  /** `a`/`b`: streaming DataFrames with (user_id, ts, event_id).
    * Output matches the batch twin: (user_id, view_id, click_id,
    * lag_sec). */
  def intervalJoinStream(a: DataFrame, b: DataFrame, windowSec: Long,
                         watermarkDelay: String = "30 minutes"): DataFrame = {
    val wa = a.select(col("user_id").as("a_user_id"), col("ts").as("a_ts"),
        col("event_id").as("a_event_id"))
      .withWatermark("a_ts", watermarkDelay)
    val wb = b.select(col("user_id").as("b_user_id"), col("ts").as("b_ts"),
        col("event_id").as("b_event_id"))
      .withWatermark("b_ts", watermarkDelay)
    wa.join(wb,
        col("a_user_id") === col("b_user_id") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("a_user_id").as("user_id"),
        col("a_event_id").as("view_id"),
        col("b_event_id").as("click_id"),
        (unix_timestamp(col("b_ts")) -
          unix_timestamp(col("a_ts"))).as("lag_sec"))
  }
}
