package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{Fixtures, Schemas, Store}

/** SURVEY §5.1 golden-snapshot suite: the reference's bundled real data
  * (88 BikePoA stations, one status snapshot, exported from
  * `/root/reference/data/bikepoa.sqlite` to typed JSONL at fixture-prep
  * time — the environment ships no sqlite-jdbc), with expected values
  * precomputed by running the reference KPI SQL in SQLite itself. */
class BikepoaGoldenSpec extends SparkSpec {

  import spark.implicits._

  private val res = "src/test/resources/bikepoa"

  private lazy val store: Store = {
    val dir = Fixtures.tempDir("bikepoa")
    val s = new Store(spark, dir.toString + "/db")
    s.upsertStations(spark.read.schema(Schemas.stations).json(s"$res/stations.jsonl"))
    s.appendStatus(spark.read.schema(Schemas.stationStatus).json(s"$res/station_status.jsonl"))
    s
  }

  test("Q1 on the real snapshot: 88 stations, 1487 capacity, 457 bikes, 829 docks") {
    val r = BikeKpi.q1NetworkSummary(store).head()
    assert(r.getLong(0) == 88L)
    assert(r.getLong(1) == 1487L)
    assert(r.getLong(2) == 457L)
    assert(r.getLong(3) == 829L)
  }

  test("Q2 on the real snapshot matches SQLite's top-10 occupancy exactly") {
    // SQLite golden (pct DESC, station_id TEXT-sort tie-break): note '102'
    // sorting before '15' at the 81.8 tie — string ids, quirk preserved
    val golden = Seq(
      ("55", 93.3), ("107", 90.9), ("40", 82.6), ("52", 82.1), ("102", 81.8),
      ("15", 81.8), ("41", 81.4), ("50", 78.9), ("16", 73.3), ("90", 73.3))
    val got = BikeKpi.q2TopOccupancy(store)
      .select("station_id", "ocupacao_pct").as[(String, Double)].collect().toSeq
    assert(got == golden)
  }

  test("Q3 on the real snapshot: one hour bucket per station, hour = '15'") {
    val rows = BikeKpi.q3HourlyProfile(store)
      .select("station_id", "hora", "media_bikes")
      .as[(String, String, Double)].collect()
    assert(rows.length == 88)
    assert(rows.forall(_._2 == "15")) // single snapshot at 15:08 UTC
    // spot value: station 1 had 0 bikes in the snapshot
    assert(rows.find(_._1 == "1").get._3 == 0.0)
  }

  test("compat views render the reference's flattened strings on real rows") {
    val compat = graft.sources.Gbfs.compatStationsView(store.stations)
      .filter(col("station_id") === "1")
      .select("rental_methods", "is_virtual_station").head()
    assert(compat.getString(0) == "KEY,TRANSITCARD,CREDITCARD,PHONE")
    assert(compat.getInt(1) == 0)
  }
}
