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

  /** Distributed spatial SELF-JOIN: all pairs of points within `radiusM`
    * meters, via grid-cell blocking — the shape where NEITHER side fits a
    * broadcast (a billion points against themselves). Each point lands in
    * one (cellx, celly) home cell sized so that two points within the
    * radius can never be more than one cell apart; the left side explodes
    * its 3x3 cell neighborhood as probe keys, the join shuffles BOTH sides
    * on the cell key only (never all-pairs), and an exact haversine
    * confirm + `idL < idR` canonicalization finish the pairs. Each
    * qualifying pair is emitted exactly once (its cell offset is
    * determined by the two home cells).
    *
    * Cell sizing is conservative-by-construction: one degree of latitude
    * is >= 110,574 m everywhere, and one degree of longitude is
    * >= 110,574·cos(maxAbsLatDeg) m anywhere in the allowed band, so
    * radiusM/110000 degrees (and its /cos counterpart) strictly contain
    * the radius — the blocking is COMPLETE, which the oracle proves by
    * brute force. Points outside the declared |lat| <= maxAbsLatDeg band
    * would silently break that containment, so they raise_error loudly
    * instead (the IntervalJoin dirty-span lesson).
    *
    * Output: (idL, idR, dist_m) with dist_m the exact haversine meters. */
  def withinRadiusPairs(
      points: org.apache.spark.sql.DataFrame, idCol: String,
      latCol: String, lonCol: String, radiusM: Double,
      maxAbsLatDeg: Double): org.apache.spark.sql.DataFrame = {
    require(radiusM > 0, s"withinRadiusPairs: radius must be positive, got $radiusM")
    require(maxAbsLatDeg >= 0 && maxAbsLatDeg < 89,
      s"withinRadiusPairs: maxAbsLatDeg must be in [0, 89), got $maxAbsLatDeg")
    val dLat = radiusM / 110000.0
    val dLon = radiusM / (110000.0 * math.cos(math.toRadians(maxAbsLatDeg)))
    val latOk = abs(col(latCol)) <= lit(maxAbsLatDeg)
    val guardedLat = when(latOk, col(latCol)).otherwise(raise_error(concat(
      lit(s"withinRadiusPairs: |$latCol| exceeds declared band $maxAbsLatDeg: "),
      col(latCol).cast("string"))))
    val base = points.select(
      col(idCol).as("__id"), guardedLat.as("__lat"), col(lonCol).as("__lon"),
      floor(col(latCol) / dLat).cast("long").as("__cx"),
      floor(col(lonCol) / dLon).cast("long").as("__cy"))
    val probes = base.select(col("__id"), col("__lat"), col("__lon"),
        explode(sequence(col("__cx") - 1, col("__cx") + 1)).as("__px"), col("__cy"))
      .select(col("__id"), col("__lat"), col("__lon"), col("__px"),
        explode(sequence(col("__cy") - 1, col("__cy") + 1)).as("__py"))
    val right = base.select(col("__id").as("__idR"), col("__lat").as("__latR"),
      col("__lon").as("__lonR"), col("__cx"), col("__cy"))
    val dist = haversineMeters(col("__lat"), col("__lon"), col("__latR"), col("__lonR"))
    probes.join(right,
        col("__px") === col("__cx") && col("__py") === col("__cy") &&
          col("__id") < col("__idR"))
      .filter(dist <= radiusM)
      .select(col("__id").as("id_l"), col("__idR").as("id_r"),
        dist.as("dist_m"))
  }
}
