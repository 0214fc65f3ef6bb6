package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the `events` shape (SURVEY.md
  * §2.3 "streaming"; the reference is batch-only — recorded in §2.2 —
  * so this is engine-added capability).
  *
  * The transform functions below are written against a plain DataFrame
  * so the SAME code path runs in batch mode (for the DuckDB oracle via
  * stream.StreamQueries) and in streaming mode (readStream → transform →
  * writeStream, exercised in StreamingSpec with a memory source/sink).
  * `window()` / `withWatermark` are identical functions in both modes —
  * that equivalence is the test strategy.
  */
object EventStreams {

  /** Tumbling 1-hour event-time window per event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 10-minute window every 5 minutes: event counts. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
      .select(col("w.start").as("w_start"), col("n"), col("users"))

  /** Watermarked streaming variant of [[tumblingCounts]] — late data
    * beyond 30 minutes is dropped; used by the streaming tests. */
  def tumblingCountsStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Gap-based sessionization (30-minute inactivity) as a batch window
    * computation: new-session flag via lag, session id via running sum.
    * The streaming twin is [[sessionizeStream]]. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > gapMinutes * 60.0, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .withColumn("duration_s",
        round(col("session_end").cast("double") - col("session_start").cast("double"), 3))
  }

  /** Streaming exactly-once dedup: drop events whose `idCol` was
    * already seen within the watermark horizon — the at-least-once →
    * exactly-once repair step in front of every downstream aggregate.
    * State is bounded by the watermark (keys older than the horizon
    * are expired), which is what makes this runnable forever at scale;
    * the batch twin is a plain `dropDuplicates(idCol)`. */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Streaming sessionization via session_window (native state store
    * path) — used by the streaming tests; semantics match
    * [[sessionize]] for on-time data. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
}
