package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table: gap-based
  * sessionization (Structured Streaming's session_window semantics, run
  * in batch) and ordered funnel conversion — the two canonical
  * user-behavior shapes a warehouse serves daily. Both are pure
  * window/aggregate plans with DuckDB twins in [[graft.OracleOps]].
  */
object EventOps {

  /** GAP-BASED SESSIONIZATION — `session_window(ts, gap)` semantics
    * (public Spark Structured Streaming session windows, SPARK-10816,
    * applied in batch): consecutive events of a user belong to one
    * session while the gap between neighbours stays ≤ `gapMinutes`
    * (touching windows merge — an event at exactly prev + gap continues
    * the session); a session's window is [first_ts, last_ts + gap). Uses the native
    * `session_window` generator so batch and streaming share one
    * operator. Output per session: (user_id, session_start, session_end,
    * n_events, sum_value·4dp), ordered (user_id, session_start).
    *
    * Scale shape: ONE shuffle keyed on user_id (the session assignment
    * is per-user local); sessions never span users, so there is no
    * global ordering anywhere. The DuckDB twin spells the identical
    * semantics as the classic gaps-and-islands (lag > gap → island id by
    * running sum) — window-function SQL, pinned to the same [first,
    * last+gap) bounds. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, s"gapMinutes must be positive (got $gapMinutes)")
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).cast("int").as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  /** ORDERED FUNNEL CONVERSION — per user, the first `stepA` event, the
    * first `stepB` event STRICTLY AFTER it, and whether B happened
    * within `withinHours` (the conversion flag). Users with no stepA are
    * absent; users with stepA but no qualifying stepB report NULL b_ts
    * and converted = false.
    *
    * Scale shape: one conditional aggregation keyed on user_id for the
    * A anchor, one min-filtered join-free second pass via conditional
    * agg over the same shuffle — the whole funnel is TWO hash aggs and
    * one broadcast-size join of per-user anchors back onto the events
    * shuffle (anchors are |users| rows). */
  def funnel(events: DataFrame, stepA: String, stepB: String,
             withinHours: Int): DataFrame = {
    require(withinHours > 0, s"withinHours must be positive (got $withinHours)")
    val anchors = events.where(col("event_type") === stepA)
      .groupBy("user_id").agg(min(col("ts")).as("a_ts"))
    val bs = events.where(col("event_type") === stepB)
      .select(col("user_id"), col("ts").as("_bts"))
      .join(anchors, Seq("user_id"))
      .where(col("_bts") > col("a_ts"))
      .groupBy("user_id").agg(min(col("_bts")).as("b_ts"))
    anchors.join(bs, Seq("user_id"), "left")
      .select(col("user_id"), col("a_ts"), col("b_ts"),
        (col("b_ts").isNotNull &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $withinHours HOURS"))
          .as("converted"))
      .orderBy("user_id")
  }
}
