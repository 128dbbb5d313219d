package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6: rate-limited reverse geocoding (reference
  * `/root/reference/streamlit_app.py:85-119`): per-station lookups against a
  * Nominatim-style endpoint, ≥1 s apart (API etiquette), neighborhood chosen
  * by the field fallback chain (F18)
  * `neighbourhood → suburb → city_district → quarter → residential`.
  *
  * Deliberately a DRIVER-side sequential loop, not a distributed job: the
  * input is the station dimension (tiny) and the rate limit is global — a
  * `foreachPartition` version would multiply the request rate by the
  * partition count. The result lands in the S8 CSV cache and joins back to
  * stations as a broadcast dimension. The HTTP fetch is a seam
  * (`fetch: (lat, lon) => String`) so tests and this zero-egress environment
  * inject fixtures; [[Http.nominatimFetch]] is the live implementation
  * (jsonv2, pt-BR labels, zoom 14 — streamlit_app.py:89-99), driven
  * end-to-end in HttpSpec.
  */
object Geocode {

  /** F18 fallback chain over a Nominatim reverse-geocode response's
    * `address` object; None when every field is absent. */
  def neighborhoodFrom(responseJson: String): Option[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val address = JsonMethods.parse(responseJson) \ "address"
    Seq("neighbourhood", "suburb", "city_district", "quarter", "residential")
      .iterator
      .map(f => address \ f)
      .collectFirst { case JString(s) if s.nonEmpty => s }
  }

  /** Sequentially geocode `(stationId, lat, lon)` points, waiting at least
    * `minIntervalMs` between calls (reference sleeps 1 s,
    * streamlit_app.py:115). A failed/empty lookup yields None for that
    * station rather than aborting the batch. */
  def geocodeAll(
      points: Seq[(String, Double, Double)],
      fetch: (Double, Double) => String,
      minIntervalMs: Long = 1000L): Seq[(String, Option[String])] = {
    var last = 0L
    points.map { case (id, lat, lon) =>
      val wait = last + minIntervalMs - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      last = System.currentTimeMillis()
      val hood =
        try neighborhoodFrom(fetch(lat, lon))
        catch { case _: Exception => None }
      id -> hood
    }
  }

  /** Lift geocode results into the (station_id, bairro) neighborhood
    * dimension (null bairro where the lookup failed). */
  def toNeighborhoodDim(
      spark: SparkSession, results: Seq[(String, Option[String])]): DataFrame = {
    import spark.implicits._
    results.map { case (id, h) => (id, h.orNull) }.toDF("station_id", "bairro")
  }
}
