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

  test("box-prefilter rule: same rows as an unboxed filter, box reaches PushedFilters") {
    import spark.implicits._
    // a REAL parquet table with physical lat/lon columns, so the implied
    // box can actually push into the scan (the rule's point at 100 TB)
    val dirPath = java.nio.file.Files.createTempDirectory("geo_box")
    val dir = dirPath.toString
    try {
    val rnd = new scala.util.Random(11)
    (1 to 2000).map { i =>
      (i.toLong, -33.0 + rnd.nextDouble() * 6, -54.0 + rnd.nextDouble() * 6)
    }.toDF("id", "lat", "lon").write.mode("overwrite").parquet(dir)
    val pts = spark.read.parquet(dir)
    val dist = call_function("haversine_m", col("lat"), col("lon"), lit(-30.4), lit(-51.5))
    val df = pts.filter(dist <= 30000.0).select("id")
    val got = df.as[Long].collect().toSet
    // independent reference via the scalar kernel
    val expected = pts.select("id", "lat", "lon").as[(Long, Double, Double)]
      .collect()
      .filter { case (_, la, lo) => Haversine.meters(la, lo, -30.4, -51.5) <= 30000.0 }
      .map(_._1).toSet
    assert(got == expected && got.nonEmpty)
    // the rule's box conjuncts must reach the parquet scan as PushedFilters
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no parquet scan in plan"))
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(lat") && pushed.contains("LessThanOrEqual(lat"),
      s"lat box not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(lon") && pushed.contains("LessThanOrEqual(lon"),
      s"lon box not pushed: $pushed")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(dirPath.toFile)
    }
  }

  test("box-prefilter rule is idempotent and skips unsound geometries") {
    import spark.implicits._
    def radiusPlan(centerLat: Double, centerLon: Double, r: Double) =
      Seq((-30.0, -51.0)).toDF("lat", "lon")
        .filter(call_function("haversine_m",
          col("lat"), col("lon"), lit(centerLat), lit(centerLon)) <= r)
        .queryExecution.analyzed
    val analyzed = radiusPlan(-30.4, -51.5, 30000.0)
    val once = HaversineBoxPrefilter(analyzed)
    val twice = HaversineBoxPrefilter(once)
    assert(!once.fastEquals(analyzed), "rule should add box conjuncts")
    assert(once.fastEquals(twice), "rule must be a fixpoint after one pass")
    def lonBounds(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      plan.expressions.flatMap(_.collect {
        case g @ org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(a, _)
          if a.references.map(_.name).toSeq == Seq("lon") => g
        case l @ org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(a, _)
          if a.references.map(_.name).toSeq == Seq("lon") => l
      })
    assert(lonBounds(once).nonEmpty, "mid-latitude circle should emit lon bounds")
    // near-pole center: the lat band crosses 89 deg -> lat bounds only
    assert(lonBounds(HaversineBoxPrefilter(radiusPlan(89.5, 0.0, 100000.0))).isEmpty,
      "polar circle must not emit lon bounds")
    // negative radius (vacuous) and globe-covering radius: rule stays away
    val vacuous = radiusPlan(-30.4, -51.5, -1.0)
    assert(HaversineBoxPrefilter(vacuous).fastEquals(vacuous))
    val global = radiusPlan(-30.4, -51.5, 2.1e7)
    assert(HaversineBoxPrefilter(global).fastEquals(global))
    // NaN radius keeps every row under Spark's NaN ordering; a NaN-bound
    // box would drop them all -> rule must stay away
    val nanR = Seq((-30.0, -51.0)).toDF("lat", "lon")
      .filter(call_function("haversine_m",
        col("lat"), col("lon"), lit(-30.4), lit(-51.5)) <= lit(Double.NaN))
      .queryExecution.analyzed
    assert(HaversineBoxPrefilter(nanR).fastEquals(nanR), "NaN radius must not emit a box")
    // nondeterministic endpoints must not be duplicated into new conjuncts
    val jitter = Seq((-30.0, -51.0)).toDF("lat", "lon")
      .filter(call_function("haversine_m",
        col("lat") + rand(7) * 0.01, col("lon"), lit(-30.4), lit(-51.5)) <= 30000.0)
      .queryExecution.analyzed
    assert(HaversineBoxPrefilter(jitter).fastEquals(jitter),
      "nondeterministic endpoint must not emit a box")
  }

  test("box-prefilter rule honors the canonical-coordinates opt-out") {
    import spark.implicits._
    val plan = Seq((-30.0, -51.0)).toDF("lat", "lon")
      .filter(call_function("haversine_m",
        col("lat"), col("lon"), lit(-30.4), lit(-51.5)) <= 30000.0)
      .queryExecution.analyzed
    spark.conf.set(HaversineBoxPrefilter.AssumeCanonicalCoordsKey, "false")
    try assert(HaversineBoxPrefilter(plan).fastEquals(plan),
      "rule must be inert when coordinates are declared non-canonical")
    finally spark.conf.unset(HaversineBoxPrefilter.AssumeCanonicalCoordsKey)
    assert(!HaversineBoxPrefilter(plan).fastEquals(plan))
  }
}
