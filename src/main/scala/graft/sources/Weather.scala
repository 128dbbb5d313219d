package graft.sources

import java.time.{Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Open-Meteo weather ingest (reference
  * `/root/reference/src/bike_analyzer/etl_weather.py`): the API returns a
  * struct-of-arrays `{hourly: {time: [...], temperature_2m: [...], ...}}`;
  * the Spark-native transpose is one `arrays_zip` + `explode` — a single
  * projection, no driver-side loop over rows (etl_weather.py:45-75 loops in
  * Python; at cluster scale the zip runs inside codegen).
  *
  * Quirk Q1 (SURVEY.md §2.13): the reference stores Open-Meteo's local-time
  * minute-precision strings and later string-joins them against UTC-offset
  * ISO stamps, matching zero rows. We canonicalize to TimestampType at the
  * ingest edge instead (to_timestamp on the `yyyy-MM-dd'T'HH:mm` label).
  */
object Weather {

  private val measureCols = Seq(
    "temperature_2m", "precipitation", "rain", "showers", "snowfall",
    "cloudcover", "windspeed_10m", "relative_humidity_2m", "weathercode")

  private def hourlyRows(raw: DataFrame): DataFrame = {
    val zipped = raw
      .select(explode(arrays_zip(
        col("hourly.time").as("time") +:
          measureCols.map(c => col(s"hourly.$c").as(c)): _*)).as("h"))
    zipped.select(
      to_timestamp(col("h.time"), "yyyy-MM-dd'T'HH:mm").as("time") +:
        measureCols.map(c => col(s"h.$c").as(c)): _*)
  }

  /** Open-Meteo payload file → weather_hourly rows (S5). */
  def hourlyFromJson(spark: SparkSession, path: String): DataFrame =
    hourlyRows(spark.read.schema(Schemas.openMeteoHourly)
      .option("multiLine", true).json(path))

  /** S5 over an in-memory payload (live-fetch path). */
  def hourlyFromPayload(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    hourlyRows(spark.read.schema(Schemas.openMeteoHourly).json(Seq(json).toDS()))
  }

  /** Live end-to-end (etl_weather.py:23-36 `fetch_weather`): build the
    * forecast URL for one city + date window + this table's hourly
    * measures, fetch, transpose. `fetch` is any URL→body function —
    * [[Http]]`.getJson` in production, a fixture server in tests. */
  def liveHourly(
      spark: SparkSession, fetch: String => String, baseUrl: String,
      lat: Double, lon: Double, start: LocalDate, end: LocalDate,
      timezone: String = "America/Sao_Paulo"): DataFrame =
    hourlyFromPayload(spark, fetch(
      Http.openMeteoUrl(baseUrl, lat, lon, timezone, start, end, measureCols)))

  /** Relative-date parsing for CLI args: `-2d`/`+2d` are day offsets from
    * `now`, anything else is an ISO date (etl_weather.py:14-20, F10). */
  def parseRelDate(s: String, now: Instant = Instant.now()): LocalDate = {
    val t = s.trim
    if (t.endsWith("d") && (t.startsWith("+") || t.startsWith("-")))
      now.atZone(ZoneOffset.UTC).toLocalDate.plusDays(t.dropRight(1).toLong)
    else LocalDate.parse(t.take(10), DateTimeFormatter.ISO_LOCAL_DATE)
  }
}
