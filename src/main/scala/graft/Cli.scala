package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.queries.{BikeKpi, SqliteDialect}
import graft.sources.{Gbfs, LlmLake, Store, Weather}

/** CLI mirroring the reference's entry points
  * (`/root/reference/src/bike_analyzer/cli.py:11-43`): init-db,
  * ingest-stations, ingest-status, ingest-weather — plus kpi/flows/sql
  * runners and the training-data curation chain. Payloads come from files
  * (the HTTP fetch seam is injected; this environment is zero-egress).
  *
  * Usage:
  *   graft.Cli init-db         <storeRoot>
  *   graft.Cli ingest-stations <storeRoot> <station_information.json>
  *   graft.Cli ingest-status   <storeRoot> <station_status.json> [isoTimestamp]
  *   graft.Cli ingest-weather  <storeRoot> <open_meteo.json>
  *   graft.Cli kpi             <storeRoot> <q1|q2|q3|q4>
  *   graft.Cli sql             <storeRoot> <script.sql>   # SQLite dialect OK
  *   graft.Cli flows           <storeRoot> [bucketMinutes] [topN]
  *   graft.Cli curate          <documents.parquet> <warehouseDir> <outDir>
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
    case "sql" :: root :: script :: Nil =>
      // runs verbatim reference SQL (sql/queries.sql, notebook cells)
      // through the SQLite dialect shim against the bootstrapped catalog
      new Store(spark, root).bootstrapCatalog()
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(script)),
        java.nio.charset.StandardCharsets.UTF_8)
      SqliteDialect.run(spark, text).foreach(_.show(50, truncate = false))
    case "flows" :: root :: rest =>
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val bucketMinutes = rest.headOption.map(_.toInt).getOrElse(10)
      val topN = rest.drop(1).headOption.map(_.toInt).getOrElse(50)
      val store = new Store(spark, root)
      val ss = store.status
        .withColumn("bucket", graft.ops.TimeOps.bucketFloor(col("scraped_at"), bucketMinutes))
      val lastPer = graft.ops.TimeOps.lastPerGroup(ss,
        Seq("station_id", "bucket"), Seq(col("scraped_at")))
      val deltas = graft.ops.TimeOps.lagDiff(lastPer,
        Seq("station_id"), Seq(col("bucket")), "num_bikes_available")
      val input = deltas
        .join(broadcast(store.stations.select("station_id", "lat", "lon")), "station_id")
        .select(unix_timestamp(col("bucket")).as("bucket"),
          col("station_id").as("station"),
          col("delta").cast("long").as("delta"), col("lat"), col("lon"))
        .as[graft.ops.StationDelta]
      graft.ops.OdInference.inferFlows(input)
        .orderBy(col("flow").desc, col("o"), col("d"))
        .limit(topN)
        .show(topN, truncate = false)
    case "curate" :: docsPath :: warehouse :: outDir :: Nil =>
      // full dedup -> cluster -> curate chain over a bucketed lake layout
      val lake = new LlmLake(spark, "graft_cli_lake", warehouse)
      lake.bootstrap()
      lake.writeDocuments(spark.read.parquet(docsPath))
      lake.writeClusterMap()
      val curated = lake.curatedDocuments()
      curated.write.mode("overwrite").parquet(outDir)
      println(s"""{"curated_docs":${spark.read.parquet(outDir).count()}}""")
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      sys.exit(2)
  }
}
