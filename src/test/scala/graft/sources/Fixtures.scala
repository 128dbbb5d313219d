package graft.sources

import java.nio.file.{Files, Path}

/** Inline GBFS / Open-Meteo payload fixtures shaped like the reference's
  * live feeds (`/root/reference/src/bike_analyzer/etl_gbfs.py:61-125`,
  * `etl_weather.py:26-36`) — written to temp files for the schema-first
  * JSON readers. */
object Fixtures {

  val discoveryFlat: String =
    """{"last_updated": 1757000000, "ttl": 60, "data": {"feeds": [
      |  {"name": "station_information", "language": "pt", "url": "http://x/pt/station_information.json"},
      |  {"name": "station_information", "language": "", "url": "http://x/station_information.json"},
      |  {"name": "station_status", "language": "en", "url": "http://x/en/station_status.json"},
      |  {"name": "system_information", "language": "", "url": "http://x/system_information.json"}
      |]}}""".stripMargin

  val discoveryNested: String =
    """{"data": {"en": {"feeds": [
      |  {"name": "station_information", "url": "http://x/en/si.json"},
      |  {"name": "station_status", "url": "http://x/en/ss.json"}
      |]}}}""".stripMargin

  val stationInfo: String =
    """{"last_updated": 1757000000, "ttl": 60, "data": {"stations": [
      |  {"station_id": "1", "name": "Praça A", "lat": -30.03, "lon": -51.22,
      |   "capacity": 12, "address": "Rua X", "rental_methods": ["KEY", "CREDITCARD"],
      |   "is_virtual_station": false, "external_id": "e1", "short_name": "01", "region_id": "r1"},
      |  {"station_id": "2", "name": "Praça B", "lat": -30.04, "lon": -51.21,
      |   "capacity": 8, "rental_methods": ["KEY"]},
      |  {"station_id": "3", "name": "Praça C", "lat": -30.05, "lon": -51.20,
      |   "capacity": 0}
      |]}}""".stripMargin

  /** Three stations; station 3 has no vehicle_types_available. */
  def stationStatus(bikes1: Int, bikes2: Int, bikes3: Int): String =
    s"""{"last_updated": 1757000100, "ttl": 60, "data": {"stations": [
       |  {"station_id": "1", "num_bikes_available": $bikes1, "num_bikes_disabled": 0,
       |   "num_docks_available": ${12 - bikes1}, "num_docks_disabled": 0,
       |   "is_installed": 1, "is_renting": 1, "is_returning": 1, "last_reported": 1757000050,
       |   "vehicle_types_available": [{"vehicle_type_id": "FIT", "count": $bikes1}]},
       |  {"station_id": "2", "num_bikes_available": $bikes2, "num_bikes_disabled": 1,
       |   "num_docks_available": ${8 - bikes2}, "num_docks_disabled": 0,
       |   "is_installed": 1, "is_renting": 1, "is_returning": 0, "last_reported": 1757000051},
       |  {"station_id": "3", "num_bikes_available": $bikes3, "num_bikes_disabled": 0,
       |   "num_docks_available": 5, "num_docks_disabled": 0,
       |   "is_installed": 0, "is_renting": 0, "is_returning": 0, "last_reported": 1757000052}
       |]}}""".stripMargin

  val openMeteo: String =
    """{"latitude": -30.0, "longitude": -51.2, "timezone": "America/Sao_Paulo",
      |"hourly": {
      |  "time": ["2025-09-04T10:00", "2025-09-04T11:00", "2025-09-04T12:00"],
      |  "temperature_2m": [18.5, 19.2, 20.1],
      |  "precipitation": [0.0, 0.4, 0.0],
      |  "rain": [0.0, 0.4, 0.0],
      |  "showers": [0.0, 0.0, 0.0],
      |  "snowfall": [0.0, 0.0, 0.0],
      |  "cloudcover": [40.0, 55.0, 30.0],
      |  "windspeed_10m": [10.2, 11.0, 9.8],
      |  "relative_humidity_2m": [70.0, 68.0, 65.0],
      |  "weathercode": [2, 61, 1]
      |}}""".stripMargin

  /** Write a payload to a temp file, returning its path. */
  def write(dir: Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  def tempDir(prefix: String): Path = Files.createTempDirectory(prefix)
}
