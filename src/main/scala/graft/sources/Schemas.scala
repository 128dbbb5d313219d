package graft.sources

import org.apache.spark.sql.types._

/** Explicit StructTypes for every table and payload — no schema inference in
  * the engine proper (reference declares DDL in
  * `/root/reference/sql/schema.sql:3-46`; GBFS payload shapes per
  * `/root/reference/src/bike_analyzer/etl_gbfs.py:61-125`).
  *
  * Type decisions (SURVEY.md §1.2): booleans are BooleanType (not 0/1 ints),
  * epochs are LongType, `scraped_at` is TimestampType internally, arrays and
  * vehicle structs stay typed (ArrayType) instead of the reference's
  * comma-joined / json.dumps TEXT flattening — compat renderers produce the
  * reference strings at the edge (array_join / to_json).
  */
object Schemas {

  /** One vehicle-type count inside station_status. */
  val vehicleType: StructType = StructType(Seq(
    StructField("vehicle_type_id", StringType),
    StructField("count", IntegerType)))

  /** stations dimension (schema.sql:3-16). */
  val stations: StructType = StructType(Seq(
    StructField("station_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("capacity", IntegerType),
    StructField("address", StringType),
    StructField("rental_methods", ArrayType(StringType)),
    StructField("is_virtual_station", BooleanType),
    StructField("external_id", StringType),
    StructField("short_name", StringType),
    StructField("region_id", StringType),
    StructField("last_updated", LongType)))

  /** station_status fact (schema.sql:18-32; surrogate autoincrement PK
    * intentionally dropped — never queried, storage-internal). */
  val stationStatus: StructType = StructType(Seq(
    StructField("station_id", StringType, nullable = false),
    StructField("num_bikes_available", IntegerType),
    StructField("num_bikes_disabled", IntegerType),
    StructField("num_docks_available", IntegerType),
    StructField("num_docks_disabled", IntegerType),
    StructField("is_installed", BooleanType),
    StructField("is_renting", BooleanType),
    StructField("is_returning", BooleanType),
    StructField("last_reported", LongType),
    StructField("scraped_at", TimestampType, nullable = false),
    StructField("vehicle_types_available", ArrayType(vehicleType))))

  /** weather_hourly (schema.sql:35-46), keyed by hour timestamp. */
  val weatherHourly: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("temperature_2m", DoubleType),
    StructField("precipitation", DoubleType),
    StructField("rain", DoubleType),
    StructField("showers", DoubleType),
    StructField("snowfall", DoubleType),
    StructField("cloudcover", DoubleType),
    StructField("windspeed_10m", DoubleType),
    StructField("relative_humidity_2m", DoubleType),
    StructField("weathercode", IntegerType)))

  /** GBFS station_information payload ({data:{stations:[...]}}). */
  val gbfsStationInfo: StructType = StructType(Seq(
    StructField("last_updated", LongType),
    StructField("ttl", IntegerType),
    StructField("data", StructType(Seq(
      StructField("stations", ArrayType(StructType(Seq(
        StructField("station_id", StringType),
        StructField("name", StringType),
        StructField("lat", DoubleType),
        StructField("lon", DoubleType),
        StructField("capacity", IntegerType),
        StructField("address", StringType),
        StructField("rental_methods", ArrayType(StringType)),
        StructField("is_virtual_station", BooleanType),
        StructField("external_id", StringType),
        StructField("short_name", StringType),
        StructField("region_id", StringType))))))))))

  /** GBFS station_status payload (optional vehicle_types_available). */
  val gbfsStationStatus: StructType = StructType(Seq(
    StructField("last_updated", LongType),
    StructField("ttl", IntegerType),
    StructField("data", StructType(Seq(
      StructField("stations", ArrayType(StructType(Seq(
        StructField("station_id", StringType),
        StructField("num_bikes_available", IntegerType),
        StructField("num_bikes_disabled", IntegerType),
        StructField("num_docks_available", IntegerType),
        StructField("num_docks_disabled", IntegerType),
        StructField("is_installed", IntegerType),
        StructField("is_renting", IntegerType),
        StructField("is_returning", IntegerType),
        StructField("last_reported", LongType),
        StructField("vehicle_types_available", ArrayType(vehicleType)))))))))))

  /** Open-Meteo hourly forecast payload: struct-of-arrays. */
  val openMeteoHourly: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("timezone", StringType),
    StructField("hourly", StructType(Seq(
      StructField("time", ArrayType(StringType)),
      StructField("temperature_2m", ArrayType(DoubleType)),
      StructField("precipitation", ArrayType(DoubleType)),
      StructField("rain", ArrayType(DoubleType)),
      StructField("showers", ArrayType(DoubleType)),
      StructField("snowfall", ArrayType(DoubleType)),
      StructField("cloudcover", ArrayType(DoubleType)),
      StructField("windspeed_10m", ArrayType(DoubleType)),
      StructField("relative_humidity_2m", ArrayType(DoubleType)),
      StructField("weathercode", ArrayType(IntegerType)))))))
}
