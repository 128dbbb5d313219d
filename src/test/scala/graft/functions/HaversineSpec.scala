package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.GeoOps

/** Exercises the native Catalyst expression through its public surface: the
  * `haversine_m` SQL function injected by [[GraftExtensions]] (which
  * [[graft.GraftSession]] configures on every engine session; SQL text and
  * `functions.call_function` both resolve through the registry). */
class HaversineSpec extends SparkSpec {

  test("native expression is bit-identical to the built-in composition") {
    import spark.implicits._
    val pts = Seq(
      (-30.0, -51.2, -30.5, -51.6),
      (-30.9, -52.1, -30.9, -52.1), // zero distance
      (0.0, 0.0, 0.0, 180.0),       // antipodal
      (89.9, 10.0, -89.9, -170.0)
    ).toDF("lat1", "lon1", "lat2", "lon2")
    val composed = pts.select(
      GeoOps.haversineMeters(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .as[Double].collect()
    val native = pts.select(
      call_function("haversine_m", col("lat1"), col("lon1"), col("lat2"), col("lon2")))
      .as[Double].collect()
    assert(composed.sameElements(native))
    assert(math.abs(native(1)) < 1e-9)
    // scalar kernel agrees too (used inside the OD matcher's JVM loop)
    assert(native(0) == Haversine.meters(-30.0, -51.2, -30.5, -51.6))
  }

  test("haversine_m resolves in SQL text with implicit numeric casts") {
    val got = spark.sql(
      "SELECT haversine_m(-30.0, -51.2, -30.5, -51.6) AS d").head().getDouble(0)
    assert(got == Haversine.meters(-30.0, -51.2, -30.5, -51.6))
    assert(got > 60000 && got < 80000) // sanity: tens of km
  }

  test("null inputs yield null (null-safe eval)") {
    val row = spark.sql(
      "SELECT haversine_m(CAST(NULL AS DOUBLE), 0.0, 1.0, 1.0) AS d").head()
    assert(row.isNullAt(0))
  }
}
