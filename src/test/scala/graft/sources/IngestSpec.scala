package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GBFS + Open-Meteo ingest: feed selection quirks, schema-first payload
  * parsing, upsert/append sinks, compat views (SURVEY.md §2.1). */
class IngestSpec extends SparkSpec {

  import spark.implicits._

  test("feed URL selection prefers unset language, handles nested layout") {
    val flat = Gbfs.discoveryFeeds(Fixtures.discoveryFlat)
    assert(Gbfs.pickFeedUrl(flat, "station_information")
      .contains("http://x/station_information.json")) // "" beats pt
    assert(Gbfs.pickFeedUrl(flat, "station_status")
      .contains("http://x/en/station_status.json")) // only en exists
    assert(Gbfs.pickFeedUrl(flat, "free_bike_status").isEmpty)
    val nested = Gbfs.discoveryFeeds(Fixtures.discoveryNested)
    assert(Gbfs.pickFeedUrl(nested, "station_status").contains("http://x/en/ss.json"))
  }

  test("stations payload parses schema-first; header last_updated stamped on rows") {
    val dir = Fixtures.tempDir("gbfs")
    val path = Fixtures.write(dir, "si.json", Fixtures.stationInfo)
    val df = Gbfs.stationsFromJson(spark, path)
    assert(df.count() == 3)
    val r1 = df.filter($"station_id" === "1").head()
    assert(r1.getAs[scala.collection.Seq[String]]("rental_methods").toSeq
      == Seq("KEY", "CREDITCARD"))
    assert(r1.getAs[Long]("last_updated") == 1757000000L)
    // missing optional fields arrive as nulls, not errors
    assert(df.filter($"station_id" === "3").head().isNullAt(df.schema.fieldIndex("address")))
  }

  test("status payload: 0/1 ints become booleans, snapshot stamped, vehicles typed") {
    val dir = Fixtures.tempDir("gbfs")
    val path = Fixtures.write(dir, "ss.json", Fixtures.stationStatus(5, 3, 0))
    val at = Timestamp.valueOf("2025-09-04 15:08:40")
    val df = Gbfs.statusFromJson(spark, path, at)
    assert(df.count() == 3)
    val r3 = df.filter($"station_id" === "3").head()
    assert(!r3.getAs[Boolean]("is_installed"))
    assert(df.filter($"station_id" === "1").head()
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("vehicle_types_available")
      .head.getString(0) == "FIT")
    assert(df.select(countDistinct($"scraped_at")).head().getLong(0) == 1)
  }

  test("station upsert: second ingest updates changed rows, keeps others") {
    val dir = Fixtures.tempDir("store")
    val store = new Store(spark, dir.toString + "/db")
    val path = Fixtures.write(dir, "si.json", Fixtures.stationInfo)
    store.upsertStations(Gbfs.stationsFromJson(spark, path))
    val updated = Fixtures.stationInfo.replace(""""capacity": 12""", """"capacity": 20""")
    val path2 = Fixtures.write(dir, "si2.json", updated)
    store.upsertStations(Gbfs.stationsFromJson(spark, path2))
    assert(store.stations.count() == 3)
    assert(store.stations.filter($"station_id" === "1").head().getAs[Int]("capacity") == 20)
  }

  test("status append partitions by scrape date; duplicate appends double (quirk Q5)") {
    val dir = Fixtures.tempDir("store")
    val store = new Store(spark, dir.toString + "/db")
    val path = Fixtures.write(dir, "ss.json", Fixtures.stationStatus(5, 3, 0))
    val snap = Gbfs.statusFromJson(spark, path, Timestamp.valueOf("2025-09-04 15:08:40"))
    store.appendStatus(snap)
    store.appendStatus(snap)
    assert(store.status.count() == 6)
    assert(new java.io.File(dir.toString + "/db/status/scrape_date=2025-09-04").isDirectory)
  }

  test("weather struct-of-arrays explodes to hourly rows; upsert is last-write-wins") {
    val dir = Fixtures.tempDir("wx")
    val store = new Store(spark, dir.toString + "/db")
    val path = Fixtures.write(dir, "om.json", Fixtures.openMeteo)
    val df = Weather.hourlyFromJson(spark, path)
    assert(df.count() == 3)
    assert(df.filter($"weathercode" === 61).head().getAs[Double]("temperature_2m") == 19.2)
    store.upsertWeather(df)
    val hotter = Fixtures.openMeteo.replace("[18.5, 19.2, 20.1]", "[28.5, 29.2, 30.1]")
    store.upsertWeather(Weather.hourlyFromJson(spark, Fixtures.write(dir, "om2.json", hotter)))
    assert(store.weather.count() == 3)
    assert(store.weather.agg(min($"temperature_2m")).head().getDouble(0) == 28.5)
  }

  test("compat views render reference-flattened strings") {
    val dir = Fixtures.tempDir("gbfs")
    val si = Gbfs.stationsFromJson(spark,
      Fixtures.write(dir, "si.json", Fixtures.stationInfo))
    val compat = Gbfs.compatStationsView(si)
    assert(compat.filter($"station_id" === "1").head()
      .getAs[String]("rental_methods") == "KEY,CREDITCARD")
    val ss = Gbfs.statusFromJson(spark,
      Fixtures.write(dir, "ss.json", Fixtures.stationStatus(5, 3, 0)),
      Timestamp.valueOf("2025-09-04 15:08:40"))
    val sc = Gbfs.compatStatusView(ss)
    assert(sc.filter($"station_id" === "1").head()
      .getAs[String]("vehicles_json") == """[{"vehicle_type_id":"FIT","count":5}]""")
    assert(sc.filter($"station_id" === "3").head().getAs[Int]("is_installed") == 0)
  }

  test("Q6: nonconforming status rows are quarantined with reasons, not stored") {
    val dir = Fixtures.tempDir("q6")
    // one clean row, one negative count, one missing station_id
    val payload =
      """{"last_updated": 1757000100, "ttl": 60, "data": {"stations": [
        |  {"station_id": "1", "num_bikes_available": 5, "num_bikes_disabled": 0,
        |   "num_docks_available": 7, "num_docks_disabled": 0,
        |   "is_installed": 1, "is_renting": 1, "is_returning": 1, "last_reported": 1757000050},
        |  {"station_id": "2", "num_bikes_available": -3, "num_bikes_disabled": 0,
        |   "num_docks_available": 7, "num_docks_disabled": 0,
        |   "is_installed": 1, "is_renting": 1, "is_returning": 1, "last_reported": 1757000051},
        |  {"num_bikes_available": 4, "num_bikes_disabled": 0,
        |   "num_docks_available": 2, "num_docks_disabled": 0,
        |   "is_installed": 1, "is_renting": 1, "is_returning": 1, "last_reported": 1757000052}
        |]}}""".stripMargin
    val ss = Gbfs.statusFromJson(spark,
      Fixtures.write(dir, "bad.json", payload),
      Timestamp.valueOf("2025-09-04 15:08:40"))
    val store = new Store(spark, dir.toString + "/db")
    val (appended, quarantined) = store.appendStatusValidated(ss)
    assert(appended == 1 && quarantined == 2)
    assert(store.status.count() == 1)
    assert(store.status.head().getAs[String]("station_id") == "1")
    val reasons = store.quarantinedStatus
      .select("_reason").as[String].collect().sorted.toSeq
    assert(reasons == Seq("negative_count", "null_station_id"))
    // a store with a clean history reports an EMPTY quarantine, not an error
    val clean = new Store(spark, dir.toString + "/db_clean")
    assert(clean.quarantinedStatus.isEmpty)
    assert(clean.quarantinedStatus.columns.contains("_reason"))
  }

  test("relative-date parse: ±Nd offsets and ISO dates (F10)") {
    val now = java.time.Instant.parse("2025-09-04T12:00:00Z")
    assert(Weather.parseRelDate("-2d", now).toString == "2025-09-02")
    assert(Weather.parseRelDate("+2d", now).toString == "2025-09-06")
    assert(Weather.parseRelDate("2025-01-15", now).toString == "2025-01-15")
  }
}
