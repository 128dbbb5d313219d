package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Live HTTP client for the three fetch sources — the production
  * implementation of the seams [[Gbfs]], [[Weather]] and [[Geocode]]
  * parse behind (reference `requests.get` sites:
  * `/root/reference/src/bike_analyzer/etl_gbfs.py:19-22,61-62`,
  * `etl_weather.py:23-36`, `streamlit_app.py:88-100`).
  *
  * Driver-side by design: every payload here is KB-sized (a discovery doc,
  * one city's station list, one forecast window, one reverse-geocode hit) —
  * there is nothing to distribute, and the geocode endpoint's rate limit is
  * GLOBAL, so a `foreachPartition` fetcher would multiply the request rate
  * by the partition count. Distributed ingest of bulk HTTP sources belongs
  * to a proper connector, not this seam.
  *
  * Beyond the reference's bare `requests.get(...)` + `raise_for_status()`:
  * transient failures (connect/read errors, HTTP 429/5xx) retry with
  * exponential backoff before surfacing, because a scheduled scraper that
  * dies on one blip loses a snapshot forever (the append-only status
  * history has no second chance at a missed scrape). Non-transient statuses
  * (4xx other than 429) fail fast with the status and body head in the
  * message. The `sleep` hook exists so tests assert backoff without
  * actually waiting.
  */
final class Http(
    requestTimeout: Duration = Duration.ofSeconds(30),
    maxAttempts: Int = 3,
    initialBackoffMs: Long = 500L,
    userAgent: String = "graft-engine/1.0 (educational)",
    sleep: Long => Unit = Thread.sleep) {

  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(requestTimeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** GET `url` → response body, retrying transient failures. */
  def get(url: String, headers: Map[String, String] = Map.empty): String = {
    var attempt = 0
    var backoff = initialBackoffMs
    var lastFailure: String = ""
    while (attempt < maxAttempts) {
      attempt += 1
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(requestTimeout).GET()
        .header("User-Agent", userAgent)
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp =
        try Some(client.send(b.build(), HttpResponse.BodyHandlers.ofString()))
        catch {
          // an interrupt is a CANCELLATION, not a transient fault: restore
          // the flag (send() clears it) and abort — retry-sleeping through
          // a shutdown would hold the thread for attempts x timeout
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            throw new java.io.IOException(s"GET $url interrupted", e)
          // connect refused/reset, read timeout: transient
          case e: java.io.IOException =>
            lastFailure = s"${e.getClass.getSimpleName}: ${e.getMessage} (GET $url)"
            None
        }
      resp.foreach { r =>
        val code = r.statusCode()
        if (code / 100 == 2) return r.body()
        val detail = s"HTTP $code from GET $url: ${r.body().take(200)}"
        if (code != 429 && code / 100 != 5)
          throw new java.io.IOException(detail) // non-transient: fail fast
        lastFailure = detail
      }
      if (attempt < maxAttempts) {
        sleep(backoff)
        backoff *= 2
      }
    }
    throw new java.io.IOException(
      s"GET $url failed after $maxAttempts attempts; last: $lastFailure")
  }

  /** GET with a JSON accept header. */
  def getJson(url: String): String = get(url, Map("Accept" -> "application/json"))
}

object Http {

  private def enc(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** Query-string builder (ordered, URL-encoded). */
  def withParams(base: String, params: Seq[(String, String)]): String =
    if (params.isEmpty) base
    else base + "?" + params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")

  /** Open-Meteo forecast URL for one city + date window + hourly measures
    * (etl_weather.py:26-35's params dict). */
  def openMeteoUrl(
      base: String, lat: Double, lon: Double, timezone: String,
      startDate: java.time.LocalDate, endDate: java.time.LocalDate,
      hourly: Seq[String]): String =
    withParams(base, Seq(
      "latitude" -> lat.toString, "longitude" -> lon.toString,
      "timezone" -> timezone,
      "start_date" -> startDate.toString, "end_date" -> endDate.toString,
      "hourly" -> hourly.mkString(",")))

  /** Nominatim-style reverse-geocode fetch function for
    * [[Geocode.geocodeAll]] (streamlit_app.py:89-99's params: jsonv2,
    * pt-BR labels, zoom 14). */
  def nominatimFetch(http: Http, base: String): (Double, Double) => String =
    (lat, lon) => http.getJson(withParams(base, Seq(
      "format" -> "jsonv2", "lat" -> lat.toString, "lon" -> lon.toString,
      "accept-language" -> "pt-BR", "zoom" -> "14")))
}
