package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic helpers. Haversine re-expressed from the reference
  * (`/root/reference/src/bike_analyzer/utils.py:12-19`, atan2 form) as the
  * equivalent asin form — pure built-in column composition, so it stays in
  * whole-stage codegen (no UDF).
  */
object GeoOps {
  val EarthRadiusMeters: Double = 6371000.0

  /** Great-circle distance in meters between (lat1,lon1) and (lat2,lon2),
    * inputs in degrees. */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusMeters) * asin(sqrt(a))
  }

  /** Plain-Scala twin for per-group imperative code (OD matcher, §2.7). */
  def haversineMeters(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusMeters * math.asin(math.sqrt(a))
  }
}
