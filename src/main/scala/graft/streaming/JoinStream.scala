package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream watermarked join — the streaming analog of the batch
  * temporal hour join (SURVEY §2.4 J4 / `bq4_weather_hour_join`, reference
  * `streamlit_app.py`'s status×weather correlation): live status
  * observations enriched with the matching hour's weather while BOTH sides
  * are unbounded streams.
  *
  * Shape: each side carries an event-time watermark and the join key is the
  * EQUAL 1-hour event-time window — the state-cleanup shape Spark
  * recognizes: buffered rows evict as soon as the slower watermark passes
  * their window, so join state is bounded by (watermark delay / window
  * span) hours per side regardless of stream length. A raw
  * timestamp-equality join (no window, no watermark) would buffer both
  * streams forever; an inequality range join would too.
  *
  * The SAME function transforms batch frames identically — Catalyst's
  * EliminateEventTimeWatermark drops the watermark nodes on batch inputs,
  * leaving exactly the batch hour join. StreamingSpec pins the stream =
  * batch equivalence on shared fixture drops.
  */
object JoinStream {

  /** Enrich status observations (station_id, scraped_at,
    * num_bikes_available) with the matching hour's weather
    * (weather_hour, temperature_2m). Inner join: observations in hours
    * with no weather record are dropped, matching the batch J4
    * semantics. `delay` bounds how late either side may arrive and
    * therefore the per-side state horizon. */
  def withHourlyWeather(status: DataFrame, weather: DataFrame,
      delay: String = "2 hours"): DataFrame = {
    // The window() column derived from a watermarked column inherits its
    // event-time marker, and a stream side may carry at most ONE
    // event-time column into a stateful join — so the observation
    // timestamp rides along as a metadata-stripped copy
    // (unix_micros→timestamp_micros is exact and sheds the marker).
    val s = status
      .withWatermark("scraped_at", delay)
      .select(col("station_id"), col("num_bikes_available"),
        timestamp_micros(unix_micros(col("scraped_at"))).as("obs_at"),
        window(col("scraped_at"), "1 hour").as("hour_w"))
    val w = weather
      .withWatermark("weather_hour", delay)
      .select(window(col("weather_hour"), "1 hour").as("hour_w"),
        col("temperature_2m"))
    s.join(w, Seq("hour_w"))
      .select(col("station_id"), col("obs_at").as("scraped_at"),
        col("num_bikes_available"), col("temperature_2m"))
  }
}
