package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization over an event stream table: split each user's
  * timeline at inactivity gaps > `gapSeconds`, emit per-session
  * aggregates.
  *
  * Scale shape: one shuffle on user_id (the window partition), then
  * the session rollup reuses the same partitioning — Catalyst collapses
  * both windows + the groupBy into a single exchange. Event-time ties
  * are broken by event_id so session numbering is deterministic.
  * (The streaming variant with real state lives in graft.streaming.)
  */
object Sessionize {

  def apply(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // exact integer microseconds: epoch *doubles* (~1.7e9 s) only carry
    // ~µs precision at the representation edge, so gap/duration math on
    // them is nondeterministic in the last digit
    val epochUs: Column = unix_micros(col("ts"))
    val prev = lag(epochUs, 1).over(byUser)
    val isNew = when(prev.isNull || epochUs - prev > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("session_idx",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("total_value"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"))
      .withColumn("duration_s",
        (unix_micros(col("session_end")) - unix_micros(col("session_start"))) / lit(1e6))
  }
}
