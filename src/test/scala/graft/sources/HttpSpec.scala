package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.time.LocalDate
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** Drives the REAL `java.net.http.HttpClient` path ([[Http]]) against an
  * in-process localhost server — the live S1–S6 fetch chain executes
  * literally, no egress required: discovery → feed selection → payload
  * fetch → typed rows, the Open-Meteo URL contract, the Nominatim
  * reverse-geocode contract, and the retry/fail-fast policy. */
class HttpSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)
  private val missingHits = new AtomicInteger(0)
  private val always500Hits = new AtomicInteger(0)
  private val seenQueries = mutable.Map.empty[String, String]
  private val seenUserAgents = mutable.Map.empty[String, String]

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handle(path: String)(f: HttpExchange => (Int, String)): Unit =
    server.createContext(path, (ex: HttpExchange) => {
      seenQueries.synchronized {
        seenQueries(path) = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        seenUserAgents(path) = Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")
      }
      val (code, body) = f(ex)
      respond(ex, code, body)
    })

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
    // discovery doc whose feed URLs point back at this server, including a
    // decoy language so the preference order is exercised live
    handle("/gbfs.json") { _ => (200,
      s"""{"data": {"feeds": [
         |  {"name": "station_information", "language": "pt", "url": "$base/decoy_si.json"},
         |  {"name": "station_information", "language": "", "url": "$base/si.json"},
         |  {"name": "station_status", "language": "en", "url": "$base/ss.json"}
         |]}}""".stripMargin)
    }
    handle("/si.json") { _ => (200, Fixtures.stationInfo) }
    handle("/decoy_si.json") { _ => (500, "should not be fetched: language preference picks ''") }
    handle("/ss.json") { _ => (200, Fixtures.stationStatus(5, 3, 0)) }
    handle("/v1/forecast") { _ => (200, Fixtures.openMeteo) }
    handle("/reverse") { _ => (200,
      """{"address": {"suburb": "Moinhos de Vento", "city": "Porto Alegre"}}""") }
    handle("/flaky") { _ =>
      if (flakyHits.incrementAndGet() <= 2) (500, "transient") else (200, "ok")
    }
    handle("/missing") { _ => { missingHits.incrementAndGet(); (404, "nope") } }
    handle("/always500") { _ => { always500Hits.incrementAndGet(); (500, "down") } }
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def noSleepHttp(maxAttempts: Int = 3,
      backoffs: mutable.Buffer[Long] = mutable.Buffer.empty) =
    new Http(maxAttempts = maxAttempts, sleep = backoffs.append(_))

  test("transient 5xx retries with exponential backoff, then succeeds") {
    flakyHits.set(0)
    val backoffs = mutable.Buffer.empty[Long]
    val got = noSleepHttp(backoffs = backoffs).get(s"$base/flaky")
    assert(got == "ok")
    assert(flakyHits.get() == 3)
    assert(backoffs.toSeq == Seq(500L, 1000L))
  }

  test("non-transient 4xx fails fast with the status in-message — no retry") {
    missingHits.set(0)
    val e = intercept[java.io.IOException](noSleepHttp().get(s"$base/missing"))
    assert(e.getMessage.contains("HTTP 404"))
    assert(missingHits.get() == 1, "a 404 must not be retried")
  }

  test("retries exhaust into a clear failure naming the last error") {
    always500Hits.set(0)
    val e = intercept[java.io.IOException](
      noSleepHttp(maxAttempts = 2).get(s"$base/always500"))
    assert(e.getMessage.contains("after 2 attempts") && e.getMessage.contains("HTTP 500"))
    assert(always500Hits.get() == 2)
  }

  test("connection failures are transient: retried, then surfaced") {
    // nothing listens on the target; connect is refused instantly on loopback
    val backoffs = mutable.Buffer.empty[Long]
    val e = intercept[java.io.IOException](
      new Http(maxAttempts = 2, sleep = backoffs.append(_))
        .get("http://127.0.0.1:9/never"))
    assert(e.getMessage.contains("after 2 attempts"))
    assert(backoffs.size == 1)
  }

  test("GBFS live chain: discovery fetch, language-preferred feed pick, typed rows") {
    val http = noSleepHttp()
    val at = Timestamp.valueOf("2025-09-04 15:08:40")
    val (stations, status) = Gbfs.liveStationsAndStatus(
      spark, s"$base/gbfs.json", http.getJson, at)
    // identical rows to the file-fixture readers — the transport is the
    // only difference (also proves the 500 decoy was never selected)
    val dir = Fixtures.tempDir("live_gbfs")
    val siFile = Gbfs.stationsFromJson(spark,
      Fixtures.write(dir, "si.json", Fixtures.stationInfo))
    val ssFile = Gbfs.statusFromJson(spark,
      Fixtures.write(dir, "ss.json", Fixtures.stationStatus(5, 3, 0)), at)
    assert(stations.collect().toSet == siFile.collect().toSet)
    assert(status.collect().toSet == ssFile.collect().toSet)
    assert(stations.schema == siFile.schema && status.schema == ssFile.schema)
  }

  test("missing feed in the discovery doc fails with the feed name") {
    val e = intercept[NoSuchElementException] {
      Gbfs.liveStationsAndStatus(spark, s"$base/gbfs.json",
        url => if (url.endsWith("/gbfs.json"))
          """{"data": {"feeds": [{"name": "station_status", "language": "", "url": "http://x/ss"}]}}"""
        else "{}",
        Timestamp.valueOf("2025-09-04 15:08:40"))
    }
    assert(e.getMessage.contains("station_information"))
  }

  test("Open-Meteo live chain: URL carries the reference's params; rows transpose") {
    val http = noSleepHttp()
    val df = Weather.liveHourly(spark, http.getJson, s"$base/v1/forecast",
      lat = -30.03, lon = -51.23,
      start = LocalDate.parse("2025-09-04"), end = LocalDate.parse("2025-09-05"))
    val rows = df.collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Double]("temperature_2m")).toSet == Set(18.5, 19.2, 20.1))
    val q = seenQueries.synchronized(seenQueries("/v1/forecast"))
    assert(q.contains("latitude=-30.03") && q.contains("longitude=-51.23"))
    assert(q.contains("start_date=2025-09-04") && q.contains("end_date=2025-09-05"))
    assert(q.contains("timezone=America%2FSao_Paulo"))
    assert(q.contains("hourly=temperature_2m%2Cprecipitation"))
  }

  test("Nominatim live chain: jsonv2/zoom-14 params, UA etiquette, F18 fallback") {
    val http = noSleepHttp()
    val got = Geocode.geocodeAll(
      Seq(("1", -30.03, -51.22)),
      Http.nominatimFetch(http, s"$base/reverse"), minIntervalMs = 0L)
    assert(got == Seq("1" -> Some("Moinhos de Vento")))
    val (q, ua) = seenQueries.synchronized(
      (seenQueries("/reverse"), seenUserAgents("/reverse")))
    assert(q.contains("format=jsonv2") && q.contains("zoom=14") &&
      q.contains("accept-language=pt-BR"))
    assert(ua.nonEmpty, "requests must carry a User-Agent (API etiquette)")
  }
}
