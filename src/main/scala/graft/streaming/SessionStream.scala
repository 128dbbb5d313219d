package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-window rollup (SURVEY §2.10 extension): variable-length
  * sessions closed by inactivity gaps, as a watermarked Structured
  * Streaming aggregation. Unlike the tumbling-window agg the window
  * length is data-dependent: Spark merges overlapping [ts, ts+gap)
  * proto-windows in the state store and the watermark closes a session
  * `gap` after its last event — so state is bounded by the watermark
  * delay plus gap, never by stream length.
  *
  * The SAME transform runs in batch (session_window is a plain grouping
  * expression there); StreamingSpec uses that for stream = batch
  * equivalence and cross-validates against the INDEPENDENT batch
  * implementation (TimeOps.sessionize, lag + running-sum windows) —
  * two different sessionization algorithms must produce identical
  * rollups. Boundary semantics: an event exactly `gap` after the
  * previous one starts a NEW session (proto-windows are half-open);
  * TimeOps.sessionize keeps it in the old session (`>` test), so the
  * cross-check runs on data with no boundary-exact gaps.
  */
object SessionStream {

  /** Per-station session rollup; `df` may be a stream (add a watermark
    * first) or a batch frame. Session end = last event + gap. */
  def stationSessions(df: DataFrame, gap: String): DataFrame =
    df.groupBy(col("station_id"), session_window(col("scraped_at"), gap).as("sw"))
      .agg(count(lit(1)).as("n_obs"), sum("num_bikes_available").as("bikes"))
      .select(col("station_id"),
        col("sw.start").as("s_start"), col("sw.end").as("s_end"),
        col("n_obs"), col("bikes"))
}
