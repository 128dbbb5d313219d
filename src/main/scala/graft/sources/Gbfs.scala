package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GBFS ingest (reference `/root/reference/src/bike_analyzer/etl_gbfs.py`),
  * re-expressed Spark-first:
  *
  *  - feed selection (S1/S2) is pure driver logic over the parsed discovery
  *    document — payloads are KB-sized, there is nothing to distribute;
  *  - payload → rows (S3/S4) is `spark.read.schema(...).json` + `inline` of
  *    `data.stations` — schema-first, no inference, codegen'd extraction;
  *  - sinks: stations MERGE-upsert (S10) via [[graft.ops.Upsert]], status
  *    append (S9) as date-partitioned parquet via [[Store]].
  *
  * The HTTP fetch itself is isolated behind a URL→body seam so tests (and
  * this zero-egress environment) inject fixtures; [[Http]] is the real
  * `java.net.http.HttpClient` implementation (retry/backoff on transient
  * failures), and [[liveStationsAndStatus]] runs the whole S1→S4 chain
  * live — HttpSpec drives it end-to-end against an in-process server.
  */
object Gbfs {

  /** Language preference for feed URL selection: unset > en > pt > pt-BR,
    * then any (etl_gbfs.py:25-39). */
  private val LangOrder = Seq("", "en", "pt", "pt-BR")

  /** One row of the discovery doc's feed list. */
  final case class Feed(name: String, language: String, url: String)

  /** Pick the URL for `feedName` following the reference's language
    * preference; None when absent. Pure function — the discovery doc is
    * parsed by the caller (see discoveryFeeds). */
  def pickFeedUrl(feeds: Seq[Feed], feedName: String): Option[String] = {
    val matching = feeds.filter(_.name == feedName)
    LangOrder.collectFirst {
      case lang if matching.exists(_.language == lang) =>
        matching.find(_.language == lang).get.url
    }.orElse(matching.headOption.map(_.url))
  }

  /** Parse a gbfs.json auto-discovery document into its feed list, handling
    * both the flat `data.feeds` and nested `data.{lang}.feeds` layouts
    * (etl_gbfs.py:42-60). json4s ships with Spark. */
  def discoveryFeeds(discoveryJson: String): Seq[Feed] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val data = JsonMethods.parse(discoveryJson) \ "data"
    val flat = (data \ "feeds").toOption
    val nested = Seq("en", "pt", "pt-BR").iterator
      .map(l => (data \ l \ "feeds").toOption).collectFirst { case Some(v) => v }
    flat.orElse(nested).toSeq.flatMap {
      case JArray(items) => items.map { f =>
        Feed(
          (f \ "name").extractOrElse[String](""),
          (f \ "language").extractOrElse[String](""),
          (f \ "url").extractOrElse[String](""))
      }
      case _ => Seq.empty
    }
  }

  private def stationRows(raw: DataFrame): DataFrame =
    raw
      .select(col("last_updated"), explode(col("data.stations")).as("s"))
      .select(
        col("s.station_id"), col("s.name"), col("s.lat"), col("s.lon"),
        col("s.capacity"), col("s.address"), col("s.rental_methods"),
        coalesce(col("s.is_virtual_station"), lit(false)).as("is_virtual_station"),
        col("s.external_id"), col("s.short_name"), col("s.region_id"),
        col("last_updated"))

  private def statusRows(raw: DataFrame, scrapedAt: java.sql.Timestamp): DataFrame =
    raw
      .select(explode(col("data.stations")).as("s"))
      .select(
        col("s.station_id"),
        col("s.num_bikes_available"), col("s.num_bikes_disabled"),
        col("s.num_docks_available"), col("s.num_docks_disabled"),
        (col("s.is_installed") === 1).as("is_installed"),
        (col("s.is_renting") === 1).as("is_renting"),
        (col("s.is_returning") === 1).as("is_returning"),
        col("s.last_reported"),
        lit(scrapedAt).as("scraped_at"),
        col("s.vehicle_types_available"))

  private def parsePayload(
      spark: SparkSession, json: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(Seq(json).toDS())
  }

  /** station_information payload file(s) → typed stations rows (S3).
    * Boolean/array columns stay typed; `last_updated` is stamped from the
    * payload header onto every row (etl_gbfs.py:107). */
  def stationsFromJson(spark: SparkSession, path: String): DataFrame =
    stationRows(spark.read.schema(Schemas.gbfsStationInfo)
      .option("multiLine", true).json(path))

  /** S3 over an in-memory payload — the live-fetch path hands the HTTP
    * body straight to the schema-first reader, no temp file. */
  def stationsFromPayload(spark: SparkSession, json: String): DataFrame =
    stationRows(parsePayload(spark, json, Schemas.gbfsStationInfo))

  /** station_status payload file(s) → typed status rows (S4), stamped with
    * the given scrape timestamp (reference stamps wall-clock at append,
    * etl_gbfs.py:119; injectable here for replayable tests). GBFS 0/1 ints
    * become BooleanType. */
  def statusFromJson(spark: SparkSession, path: String, scrapedAt: java.sql.Timestamp): DataFrame =
    statusRows(spark.read.schema(Schemas.gbfsStationStatus)
      .option("multiLine", true).json(path), scrapedAt)

  /** S4 over an in-memory payload (live-fetch path). */
  def statusFromPayload(
      spark: SparkSession, json: String, scrapedAt: java.sql.Timestamp): DataFrame =
    statusRows(parsePayload(spark, json, Schemas.gbfsStationStatus), scrapedAt)

  /** S1→S4 live end-to-end (etl_gbfs.py:42-63 `fetch_stations_and_status`):
    * fetch + parse the discovery doc, pick both feed URLs by language
    * preference, fetch both payloads, return (stations, status) typed
    * frames. `fetch` is any URL→body function — [[Http]]`.getJson` in
    * production, a localhost fixture server or file reader in tests. */
  def liveStationsAndStatus(
      spark: SparkSession, discoveryUrl: String, fetch: String => String,
      scrapedAt: java.sql.Timestamp): (DataFrame, DataFrame) = {
    val feeds = discoveryFeeds(fetch(discoveryUrl))
    if (feeds.isEmpty) throw new NoSuchElementException(
      s"no feeds found in GBFS discovery doc at $discoveryUrl")
    def urlOf(name: String) = pickFeedUrl(feeds, name).getOrElse(
      throw new NoSuchElementException(
        s"feed '$name' not present in GBFS discovery doc at $discoveryUrl"))
    val si = urlOf("station_information")
    val ss = urlOf("station_status")
    (stationsFromPayload(spark, fetch(si)),
      statusFromPayload(spark, fetch(ss), scrapedAt))
  }

  /** Compat view matching the reference's flattened storage strings:
    * rental_methods comma-joined (F13), booleans as 0/1 (F14),
    * vehicles as a JSON string (F12), scraped_at as ISO text. */
  def compatStationsView(stations: DataFrame): DataFrame =
    stations
      .withColumn("rental_methods", array_join(col("rental_methods"), ","))
      .withColumn("is_virtual_station",
        coalesce(col("is_virtual_station"), lit(false)).cast("int"))

  def compatStatusView(status: DataFrame): DataFrame =
    status
      .withColumn("is_installed", col("is_installed").cast("int"))
      .withColumn("is_renting", col("is_renting").cast("int"))
      .withColumn("is_returning", col("is_returning").cast("int"))
      .withColumn("vehicles_json", to_json(col("vehicle_types_available")))
      .drop("vehicle_types_available")
}
