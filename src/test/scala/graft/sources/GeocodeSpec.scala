package graft.sources

import graft.SparkSpec

class GeocodeSpec extends SparkSpec {

  test("neighborhood fallback chain follows the F18 preference order") {
    def resp(fields: (String, String)*): String =
      s"""{"address":{${fields.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")}}}"""
    assert(Geocode.neighborhoodFrom(
      resp("suburb" -> "S", "neighbourhood" -> "N")) == Some("N"))
    assert(Geocode.neighborhoodFrom(
      resp("residential" -> "R", "suburb" -> "S")) == Some("S"))
    assert(Geocode.neighborhoodFrom(
      resp("quarter" -> "Q", "residential" -> "R")) == Some("Q"))
    assert(Geocode.neighborhoodFrom(resp("residential" -> "R")) == Some("R"))
    assert(Geocode.neighborhoodFrom(resp("city" -> "C")).isEmpty)
    assert(Geocode.neighborhoodFrom(resp("neighbourhood" -> "")).isEmpty)
  }

  test("geocodeAll enforces the minimum interval between calls") {
    val times = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = Geocode.geocodeAll(
      Seq(("1", -30.0, -51.2), ("2", -30.1, -51.3), ("3", -30.2, -51.4)),
      fetch = (_, _) => {
        times += System.currentTimeMillis()
        """{"address":{"suburb":"Centro"}}"""
      },
      minIntervalMs = 50L)
    assert(got == Seq("1" -> Some("Centro"), "2" -> Some("Centro"), "3" -> Some("Centro")))
    val gaps = times.sliding(2).map(w => w(1) - w(0)).toSeq
    assert(gaps.forall(_ >= 45L), s"gaps $gaps")
  }

  test("a failing lookup yields None for that station, not an abort") {
    val got = Geocode.geocodeAll(
      Seq(("1", 0.0, 0.0), ("2", 1.0, 1.0)),
      fetch = (lat, _) =>
        if (lat == 0.0) throw new RuntimeException("HTTP 429")
        else """{"address":{"quarter":"Q4"}}""",
      minIntervalMs = 0L)
    assert(got == Seq("1" -> None, "2" -> Some("Q4")))
  }

  test("toNeighborhoodDim builds the broadcast-ready dimension") {
    val df = Geocode.toNeighborhoodDim(spark,
      Seq("1" -> Some("Centro"), "2" -> None))
    val rows = df.collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(rows == Seq("1" -> Some("Centro"), "2" -> None))
    assert(df.columns.toSeq == Seq("station_id", "bairro"))
  }
}
