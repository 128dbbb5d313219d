package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.queries.BikeKpi
import graft.sources.{Gbfs, Store, Weather}

/** CLI mirroring the reference's entry points
  * (`/root/reference/src/bike_analyzer/cli.py:11-43`): init-db,
  * ingest-stations, ingest-status, ingest-weather — plus kpi/flows runners.
  * Payloads come from files (the HTTP fetch seam is injected; this
  * environment is zero-egress).
  *
  * Usage:
  *   graft.Cli init-db         <storeRoot>
  *   graft.Cli ingest-stations <storeRoot> <station_information.json>
  *   graft.Cli ingest-status   <storeRoot> <station_status.json> [isoTimestamp]
  *   graft.Cli ingest-weather  <storeRoot> <open_meteo.json>
  *   graft.Cli kpi             <storeRoot> <q1|q2|q3|q4>
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 4, appName = "graft-cli")
    try run(spark, args.toList)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "init-db" :: root :: Nil =>
      new Store(spark, root).bootstrapCatalog()
      println("""{"ok":true}""")
    case "ingest-stations" :: root :: payload :: Nil =>
      val df = Gbfs.stationsFromJson(spark, payload)
      new Store(spark, root).upsertStations(df)
      println(s"""{"stations_upserted":${df.count()}}""")
    case "ingest-status" :: root :: payload :: rest =>
      val at = rest.headOption
        .map(s => Timestamp.from(Instant.parse(s)))
        .getOrElse(new Timestamp(System.currentTimeMillis()))
      val df = Gbfs.statusFromJson(spark, payload, at)
      new Store(spark, root).appendStatus(df)
      println(s"""{"status_rows":${df.count()}}""")
    case "ingest-weather" :: root :: payload :: Nil =>
      val df = Weather.hourlyFromJson(spark, payload)
      new Store(spark, root).upsertWeather(df)
      println(s"""{"weather_rows":${df.count()}}""")
    case "kpi" :: root :: q :: Nil =>
      val store = new Store(spark, root)
      val df = q match {
        case "q1" => BikeKpi.q1NetworkSummary(store)
        case "q2" => BikeKpi.q2TopOccupancy(store)
        case "q3" => BikeKpi.q3HourlyProfile(store)
        case "q4" => BikeKpi.q4WeatherJoin(store)
        case other => sys.error(s"unknown KPI '$other' (expected q1..q4)")
      }
      df.show(50, truncate = false)
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      sys.exit(2)
  }
}
