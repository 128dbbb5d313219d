package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Det, TimeOps}
import graft.sources.Store

/** The four declared KPI queries over the REAL bike schema (reference
  * `/root/reference/sql/queries.sql:3-59`), as DataFrame programs and as
  * SQL text (the reference SQL with its two SQLite-isms shimmed:
  * STRFTIME('%H',·) → date_format HH, SUBSTR||':00:00' → date_trunc.
  * Quirks Q1/Q2 (SURVEY.md §2.13) are canonicalized: timestamps, not
  * strings). BikeShapeQueries oracle-checks the same shapes on the driver
  * testdata; KpiGoldenSpec golden-checks these against hand-computed values
  * on a real-schema fixture.
  */
object BikeKpi {

  /** Q1 network summary: latest snapshot x stations, 4-measure agg. */
  def q1NetworkSummary(store: Store): DataFrame = {
    val ss = store.status
    val last = ss.agg(max(col("scraped_at")).as("scraped_at"))
    ss.join(broadcast(last), "scraped_at")
      .join(broadcast(store.stations), "station_id")
      .agg(
        countDistinct(col("station_id")).as("estacoes"),
        sum(coalesce(col("capacity"), lit(0))).as("capacidade_total"),
        sum(col("num_bikes_available")).as("bikes_disponiveis"),
        sum(col("num_docks_available")).as("docks_disponiveis"))
  }

  /** Q2 top-10 occupancy at the latest snapshot. */
  def q2TopOccupancy(store: Store, k: Int = 10): DataFrame = {
    val ss = store.status
    val last = ss.agg(max(col("scraped_at")).as("scraped_at"))
    ss.join(broadcast(last), "scraped_at")
      .join(broadcast(store.stations), "station_id")
      .filter(col("capacity").isNotNull && col("capacity") > 0)
      .select(col("station_id"), col("name"), col("capacity"),
        col("num_bikes_available"),
        round(lit(100.0) * col("num_bikes_available") / nullif(col("capacity"), lit(0)), 1)
          .as("ocupacao_pct"))
      .orderBy(col("ocupacao_pct").desc, col("station_id"))
      .limit(k)
  }

  /** Q3 hourly availability profile per station (string hour '00'..'23'). */
  def q3HourlyProfile(store: Store): DataFrame =
    store.status
      .join(broadcast(store.stations), "station_id")
      .groupBy(col("station_id"), col("name"),
        TimeOps.hourOfDay(col("scraped_at")).as("hora"))
      .agg(Det.iavg(col("num_bikes_available")).as("media_bikes"))
      .orderBy(col("name"), col("hora"))

  /** Q4 weather correlation: hourly status mean joined to weather on the
    * canonicalized hour timestamp (quirk Q1 fixed). */
  def q4WeatherJoin(store: Store): DataFrame = {
    val statusHour = store.status
      .groupBy(date_trunc("hour", col("scraped_at")).as("hora"))
      .agg(Det.iavg(col("num_bikes_available")).as("media_bikes"))
    store.weather
      .join(statusHour, col("time") === col("hora"))
      .select(col("hora"), col("temperature_2m"), col("precipitation"),
        col("media_bikes"))
      .orderBy(col("hora"))
  }

  /** The reference SQL, SQLite-isms shimmed, runnable via spark.sql after
    * Store.bootstrapCatalog(). Keys match the DataFrame variants. */
  val sql: Map[String, String] = Map(
    "q1" ->
      """WITH last_scrape AS (SELECT MAX(scraped_at) AS ts FROM station_status)
        |SELECT COUNT(DISTINCT ss.station_id) AS estacoes,
        |  SUM(COALESCE(s.capacity, 0)) AS capacidade_total,
        |  SUM(ss.num_bikes_available) AS bikes_disponiveis,
        |  SUM(ss.num_docks_available) AS docks_disponiveis
        |FROM station_status ss
        |JOIN last_scrape ls ON ss.scraped_at = ls.ts
        |JOIN stations s ON s.station_id = ss.station_id""".stripMargin,
    "q2" ->
      """WITH last_scrape AS (SELECT MAX(scraped_at) AS ts FROM station_status)
        |SELECT ss.station_id, s.name, s.capacity, ss.num_bikes_available,
        |  ROUND(100.0D * ss.num_bikes_available / NULLIF(s.capacity, 0), 1) AS ocupacao_pct
        |FROM station_status ss
        |JOIN last_scrape ls ON ss.scraped_at = ls.ts
        |JOIN stations s ON s.station_id = ss.station_id
        |WHERE s.capacity IS NOT NULL AND s.capacity > 0
        |ORDER BY ocupacao_pct DESC, ss.station_id LIMIT 10""".stripMargin,
    "q3" ->
      """SELECT ss.station_id, s.name, date_format(ss.scraped_at, 'HH') AS hora,
        |  AVG(ss.num_bikes_available) AS media_bikes
        |FROM station_status ss JOIN stations s USING (station_id)
        |GROUP BY 1, 2, 3 ORDER BY s.name, hora""".stripMargin,
    "q4" ->
      """WITH status_hour AS (
        |  SELECT date_trunc('hour', scraped_at) AS hora,
        |    AVG(num_bikes_available) AS media_bikes
        |  FROM station_status GROUP BY 1)
        |SELECT sh.hora, wh.temperature_2m, wh.precipitation, sh.media_bikes
        |FROM status_hour sh JOIN weather_hourly wh ON sh.hora = wh.time
        |ORDER BY sh.hora""".stripMargin)

  def runSql(spark: SparkSession, key: String): DataFrame = spark.sql(sql(key))
}
