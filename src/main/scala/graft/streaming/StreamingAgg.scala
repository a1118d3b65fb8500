package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with a late-data bound (SURVEY §7.1
  * step 11: "tumbling/sliding event-time windows + watermark for late
  * data"). Pure built-ins — `withWatermark` + `window()` + grouped
  * aggregates keep the whole plan inside Spark's streaming aggregation
  * machinery (state eviction, exactly-once append of finalized windows),
  * which is precisely what bounds state at 100 TB ingest: a window's
  * state is dropped once the watermark passes its end, and
  * later-than-watermark events are dropped instead of resurrecting it.
  */
object StreamingAgg {

  /** Per-series tumbling event-time stats. Input columns:
    * (user_id, ts TIMESTAMP, value DOUBLE). Append-mode output: one
    * finalized row per (user_id, window) with count/sum/avg/min/max —
    * the streaming twin of the batch disjoint-window stats (P4).
    */
  def tumblingStats(points: DataFrame, delay: String, windowDur: String): DataFrame =
    points
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), window(col("ts"), windowDur))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum"),
        avg(col("value")).as("mean"),
        min(col("value")).as("mn"),
        max(col("value")).as("mx"))
      .select(col("user_id"), col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("n"), col("sum"),
        col("mean"), col("mn"), col("mx"))
}
