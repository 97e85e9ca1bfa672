package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY.md §2.3 streaming row): the
  * reference is strictly batch (tinymr.py:29), so these are north-star
  * extensions, built so the SAME transformation serves batch and
  * streaming DataFrames — Spark's unified model. Watermarks bound state:
  * at 100 TB/day the window store only ever holds watermark-horizon
  * minutes of per-key state.
  */
object EventStream {

  /** Tumbling-window event counts per type with late-data eviction.
    * On a batch frame `withWatermark` is a no-op and this is an ordinary
    * windowed aggregation — one code path, two execution modes.
    */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"))

  /** Streaming exact dedup on a key column, state bounded by watermark —
    * the streaming face of the batch dedup operators (graft.operators.Dedup).
    */
  def dedupStream(events: DataFrame, key: String, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(key)

  /** Per-user running aggregate over an event stream — value sums per
    * user per window, the streaming analogue of the reducer-with-state
    * idiom.
    */
  def userWindowSums(
      events: DataFrame,
      windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("user_id"), col("sum_value"))
}
