package graft.queries

import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.{Fixtures, Gbfs, Store, Weather}

/** Golden checks of Q1-Q4 on a real-schema fixture store with hand-computed
  * expected values, plus DataFrame == spark.sql equivalence for each. */
class KpiGoldenSpec extends SparkSpec {

  import spark.implicits._

  private lazy val store: Store = {
    val dir = Fixtures.tempDir("kpi")
    val s = new Store(spark, dir.toString + "/db")
    s.upsertStations(Gbfs.stationsFromJson(spark,
      Fixtures.write(dir, "si.json", Fixtures.stationInfo)))
    // two snapshots an hour apart: bikes (5,3,0) then (7,2,1)
    s.appendStatus(Gbfs.statusFromJson(spark,
      Fixtures.write(dir, "s1.json", Fixtures.stationStatus(5, 3, 0)),
      Timestamp.valueOf("2025-09-04 10:10:00")))
    s.appendStatus(Gbfs.statusFromJson(spark,
      Fixtures.write(dir, "s2.json", Fixtures.stationStatus(7, 2, 1)),
      Timestamp.valueOf("2025-09-04 11:10:00")))
    s.upsertWeather(Weather.hourlyFromJson(spark,
      Fixtures.write(dir, "om.json", Fixtures.openMeteo)))
    s.bootstrapCatalog()
    s
  }

  test("Q1: latest snapshot only — 3 stations, caps 12+8+0, bikes 7+2+1") {
    val r = BikeKpi.q1NetworkSummary(store).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 20 && r.getLong(2) == 10)
    assert(BikeKpi.runSql(spark, "q1").head() == r)
  }

  test("Q2: occupancy pct ranked, zero-capacity station filtered out") {
    val rows = BikeKpi.q2TopOccupancy(store)
      .select("station_id", "ocupacao_pct").as[(String, Double)].collect().toSeq
    // station1: 7/12 = 58.3; station2: 2/8 = 25.0; station3 excluded (cap 0)
    assert(rows == Seq(("1", 58.3), ("2", 25.0)))
    val viaSql = BikeKpi.runSql(spark, "q2")
      .select("station_id", "ocupacao_pct").as[(String, Double)].collect().toSeq
    assert(viaSql == rows)
  }

  test("Q3: per-station per-hour string-hour means over both snapshots") {
    val rows = BikeKpi.q3HourlyProfile(store)
      .select("station_id", "hora", "media_bikes")
      .as[(String, String, Double)].collect().toSeq
    assert(rows.contains(("1", "10", 5.0)) && rows.contains(("1", "11", 7.0)))
    assert(rows.forall(_._2.length == 2)) // zero-padded string hours (quirk Q8)
    val viaSql = BikeKpi.runSql(spark, "q3")
      .select("station_id", "hora", "media_bikes")
      .as[(String, String, Double)].collect().toSeq
    assert(viaSql.toSet == rows.toSet)
  }

  test("Q4: hour-canonicalized weather join matches both snapshot hours") {
    val rows = BikeKpi.q4WeatherJoin(store)
      .select("temperature_2m", "media_bikes").as[(Double, Double)].collect().toSeq
    // 10:00 snapshot mean (5+3+0)/3, 11:00 mean (7+2+1)/3 against 18.5/19.2
    assert(rows == Seq((18.5, 8.0 / 3), (19.2, 10.0 / 3)))
    val viaSql = BikeKpi.runSql(spark, "q4")
      .select("temperature_2m", "media_bikes").as[(Double, Double)].collect().toSeq
    assert(viaSql == rows)
  }
}
