package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeGeoOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketFloor floors to n-minute boundaries") {
    val df = Seq(ts("2025-01-01 10:07:59"), ts("2025-01-01 10:10:00"))
      .toDF("t").select(TimeOps.bucketFloor(col("t"), 10).as("b"))
    assert(df.as[Timestamp].collect().toSeq ==
      Seq(ts("2025-01-01 10:00:00"), ts("2025-01-01 10:10:00")))
  }

  test("lagDiff: first row per partition is 0, others are consecutive diffs") {
    val df = Seq(("s1", 1, 10.0), ("s1", 2, 13.0), ("s1", 3, 11.0), ("s2", 1, 5.0))
      .toDF("st", "seq", "v")
    val got = TimeOps.lagDiff(df, Seq("st"), Seq(col("seq")), "v")
      .select("st", "seq", "delta").as[(String, Int, Double)].collect().toSet
    assert(got == Set(("s1", 1, 0.0), ("s1", 2, 3.0), ("s1", 3, -2.0), ("s2", 1, 0.0)))
  }

  test("lastPerGroup keeps exactly the max-order row per key") {
    val df = Seq(("a", 1, "x"), ("a", 3, "y"), ("a", 2, "z"), ("b", 9, "w"))
      .toDF("k", "ord", "v")
    val got = TimeOps.lastPerGroup(df, Seq("k"), Seq(col("ord")))
      .select("k", "v").as[(String, String)].collect().toSet
    assert(got == Set(("a", "y"), ("b", "w")))
  }

  test("sessionize splits on gaps > threshold, numbers sessions per key") {
    import spark.implicits._
    val df = Seq(
      ("u1", "2025-09-04 10:00:00", 1),
      ("u1", "2025-09-04 10:10:00", 2), // same session (10 min gap)
      ("u1", "2025-09-04 11:30:00", 3), // new session (80 min gap)
      ("u2", "2025-09-04 10:00:00", 4)  // separate key
    ).toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", org.apache.spark.sql.functions.to_timestamp(col("ts_s")))
    val got = TimeOps.sessionize(df, "user_id", "ts", 30, Seq(col("event_id")))
      .select("event_id", "session_id").as[(Int, String)].collect().toMap
    assert(got(1) == "u1#1" && got(2) == "u1#1")
    assert(got(3) == "u1#2")
    assert(got(4) == "u2#1")
  }

  test("timeRange composes optional bounds; absent bounds filter nothing") {
    val df = Seq(ts("2025-01-01 00:00:00"), ts("2025-06-01 00:00:00")).toDF("t")
    assert(df.filter(TimeOps.timeRange(col("t"), None, None)).count() == 2)
    assert(df.filter(TimeOps.timeRange(col("t"), Some("2025-03-01"), None)).count() == 1)
    assert(df.filter(TimeOps.timeRange(col("t"), None, Some("2025-03-01"))).count() == 1)
  }

  test("haversine column expression agrees with the scalar twin; known value") {
    // Porto Alegre city center to airport ~ 6.4 km; scalar twin is ground truth
    val d = GeoOps.haversineMeters(-30.0331, -51.23, -29.9939, -51.1711)
    assert(d > 6000 && d < 8000)
    val viaCol = Seq((-30.0331, -51.23, -29.9939, -51.1711))
      .toDF("la1", "lo1", "la2", "lo2")
      .select(GeoOps.haversineMeters(col("la1"), col("lo1"), col("la2"), col("lo2")))
      .as[Double].head()
    assert(math.abs(viaCol - d) < 1e-6)
  }

  test("withinRadiusPairs: cell blocking is COMPLETE vs brute force on random points") {
    val rng = new scala.util.Random(7)
    // clustered + scattered points around a band edge so plenty of pairs
    // straddle cell boundaries
    val pts = (0 until 300).map { i =>
      (i.toLong, -30.0 - rng.nextDouble() * 0.5, -51.0 - rng.nextDouble() * 0.5)
    }
    val r = 4000.0
    val got = GeoOps.withinRadiusPairs(
        pts.toDF("id", "lat", "lon"), "id", "lat", "lon", r, maxAbsLatDeg = 31.0)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      if GeoOps.haversineMeters(a._2, a._3, b._2, b._3) <= r
    } yield (a._1, b._1)).toSet
    assert(got == brute, s"cell-blocked ${got.size} vs brute ${brute.size}")
    assert(brute.nonEmpty) // the fixture actually exercises pairs
  }

  test("withinRadiusPairs: each pair appears exactly once, symmetric inputs") {
    val pts = Seq((1L, -30.001, -51.001), (2L, -30.001, -51.0012),
      (3L, -30.5, -51.5)).toDF("id", "lat", "lon")
    val got = GeoOps.withinRadiusPairs(pts, "id", "lat", "lon", 1000.0, 31.0)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L))) // one pair, once, canonical order
  }

  test("withinRadiusPairs: a point outside the declared band raises loudly") {
    val pts = Seq((1L, -30.0, -51.0), (2L, -35.0, -51.0)).toDF("id", "lat", "lon")
    val e = intercept[Exception] {
      GeoOps.withinRadiusPairs(pts, "id", "lat", "lon", 1000.0, maxAbsLatDeg = 31.0)
        .collect()
    }
    assert(e.getMessage != null)
  }

  // ── DBSCAN ────────────────────────────────────────────────────────────────

  private def runDbscan(pts: Seq[(Long, Double, Double)], epsM: Double,
      minPts: Int): Map[Long, (String, Option[Long])] =
    try GeoOps.dbscan(pts.toDF("id", "lat", "lon"), "id", "lat", "lon",
        epsM, minPts, maxAbsLatDeg = 32.0)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    finally graft.llm.Caches.releaseAll(spark) // dbscan persists its pair stream

  test("dbscan: cores, borders, noise, and singleton-core clusters on a hand fixture") {
    // 0.002 deg lat ~ 222 m; eps 500 m, minPts 3 (self + 2 neighbors).
    val pts = Seq(
      // blob A: mutual triangle -> all core, cluster = min id 1; 4 hangs
      // off 3 only (one neighbor) -> border of A
      (1L, -30.000, -51.0), (2L, -30.002, -51.0), (3L, -30.004, -51.0),
      (4L, -30.008, -51.0),
      // lone point far away -> noise
      (5L, -30.200, -51.0),
      // blob B: second cluster, 55 km from A
      (6L, -30.500, -51.0), (7L, -30.502, -51.0), (8L, -30.504, -51.0),
      // 9 is core via two BORDER-only neighbors (10, 11 are 445 m away on
      // opposite sides, 890 m from each other): no core neighbor -> 9 is a
      // singleton-core cluster and both wings attach to it as borders
      (9L, -31.000, -51.0), (10L, -31.004, -51.0), (11L, -30.996, -51.0))
    val got = runDbscan(pts, 500.0, 3)
    val expected = Map(
      1L -> ("core", Some(1L)), 2L -> ("core", Some(1L)), 3L -> ("core", Some(1L)),
      4L -> ("border", Some(1L)), 5L -> ("noise", None),
      6L -> ("core", Some(6L)), 7L -> ("core", Some(6L)), 8L -> ("core", Some(6L)),
      9L -> ("core", Some(9L)), 10L -> ("border", Some(9L)), 11L -> ("border", Some(9L)))
    assert(got == expected)
  }

  test("dbscan: equidistant border between two clusters attaches to the smaller core id") {
    // Two tight 4-point columns (111 m spacing: every member sees 3
    // neighbors -> core at minPts 4) whose facing ends are 890 m apart
    // (not neighbors at eps 500), with a border EXACTLY midway between
    // core 4 and core 7 (same meridian, 445 m each; only those 2 neighbors,
    // so it stays non-core): the (rounded-distance, neighbor-id) order must
    // pin the assignment to core 4's cluster.
    val pts = Seq(
      (1L, -30.000, -51.0), (2L, -30.001, -51.0), (3L, -30.002, -51.0),
      (4L, -30.003, -51.0),
      (5L, -30.007, -51.0), // the contested border
      (7L, -30.011, -51.0), (8L, -30.012, -51.0), (9L, -30.013, -51.0),
      (10L, -30.014, -51.0))
    val got = runDbscan(pts, 500.0, 4)
    assert(got(4L) == ("core", Some(1L)) && got(7L) == ("core", Some(7L)))
    assert(got(5L) == ("border", Some(1L)))
  }

  test("dbscan: full labeling matches an in-memory reference DBSCAN on random points") {
    val rng = new scala.util.Random(11)
    val pts = (0 until 250).map { i =>
      (i.toLong, -30.0 - rng.nextDouble() * 0.4, -51.0 - rng.nextDouble() * 0.4)
    }
    val eps = 3000.0
    val minPts = 4
    // reference: brute-force neighbors, union-find components, nearest-core
    // borders with the same (mm-rounded distance, id) tie-break
    val nbrs: Map[Long, Seq[(Long, Double)]] = (for {
      a <- pts; b <- pts if a._1 != b._1
      d = GeoOps.haversineMeters(a._2, a._3, b._2, b._3) if d <= eps
    } yield (a._1, (b._1, d))).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSeq }
      .withDefaultValue(Seq.empty)
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (c <- core; (n, _) <- nbrs(c) if core(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clusterOf: Map[Long, Long] =
      core.map(c => c -> find(c)).toMap // min-id root by construction above
    def mm(d: Double): BigDecimal =
      BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val expected: Map[Long, (String, Option[Long])] = pts.map { case (id, _, _) =>
      if (core(id)) id -> ("core", Some(clusterOf(id)))
      else {
        val coreNbrs = nbrs(id).filter { case (n, _) => core(n) }
        if (coreNbrs.isEmpty) id -> ("noise", None)
        else {
          val (bestN, _) = coreNbrs.minBy { case (n, d) => (mm(d), n) }
          id -> ("border", Some(clusterOf(bestN)))
        }
      }
    }.toMap
    assert(runDbscan(pts, eps, minPts) == expected)
    assert(core.nonEmpty && expected.values.exists(_._1 == "border") &&
      expected.values.exists(_._1 == "noise")) // the fixture exercises all roles
  }
}
