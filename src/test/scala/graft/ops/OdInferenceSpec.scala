package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Properties of the greedy OD matcher (SURVEY.md §2.7/§2.13 Q4): flow
  * conservation, termination, non-negativity, and the pinned first-wins
  * tie-breaking that oracle parity with the reference depends on.
  * Property loops use a fixed seed — deterministic, replayable. */
class OdInferenceSpec extends SparkSpec {

  private def delta(st: String, d: Long, lat: Double = 0, lon: Double = 0) =
    StationDelta(0L, st, d, lat, lon)

  private def randomCases(n: Int): Seq[List[StationDelta]] = {
    val rnd = new Random(42)
    Seq.fill(n)(List.fill(12)(delta(
      (rnd.nextInt(20) + 1).toString,
      rnd.nextLong(61) - 30,
      -31.0 + rnd.nextDouble() * 2,
      -52.0 + rnd.nextDouble() * 2)))
  }

  test("flows conserved: total = min(supply, demand), all flows positive") {
    randomCases(200).foreach { rows =>
      val flows = OdInference.greedyMatch(rows)
      val supply = rows.filter(_.delta < 0).map(-_.delta).sum
      val demand = rows.filter(_.delta > 0).map(_.delta).sum
      assert(flows.forall(_.flow > 0))
      assert(flows.map(_.flow).sum == math.min(supply, demand))
    }
  }

  test("per-station outflow bounded by its supply") {
    randomCases(200).foreach { rows =>
      val flows = OdInference.greedyMatch(rows)
      val supply = rows.filter(_.delta < 0)
        .groupBy(_.station).map { case (k, v) => k -> v.map(-_.delta).sum }
      flows.groupBy(_.o).map { case (k, v) => k -> v.map(_.flow).sum }
        .foreach { case (st, f) => assert(f <= supply(st)) }
    }
  }

  test("deterministic under input permutation (internal station sort pins order)") {
    randomCases(100).foreach { rows =>
      assert(OdInference.greedyMatch(rows) == OdInference.greedyMatch(rows.reverse))
    }
  }

  test("largest-supply departure first; ties break first-wins in station order") {
    // equal supplies: station '1' (first in sorted order) goes first;
    // equidistant arrivals: '3' (first in order) wins.
    val rows = Seq(
      delta("2", -5, lat = 0, lon = 0),
      delta("1", -5, lat = 0, lon = 0),
      delta("3", 4, lat = 1, lon = 0),
      delta("4", 6, lat = -1, lon = 0)) // same distance from (0,0) as '3'
    val flows = OdInference.greedyMatch(rows)
    assert(flows.head == Flow("1", "3", 4))
  }

  test("flowInvariants: per-bucket flow_total = least(arrivals, departures), matching local sums") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = (0 until 400).map { _ =>
      StationDelta(60L * rnd.nextInt(8),
        (rnd.nextInt(20) + 1).toString, rnd.nextLong(61) - 30,
        -31.0 + rnd.nextDouble() * 2, -52.0 + rnd.nextDouble() * 2)
    }
    val got = OdInference.flowInvariants(rows.toDS())
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    rows.groupBy(_.bucket).foreach { case (b, rs) =>
      val arr = rs.filter(_.delta > 0).map(_.delta).sum
      val dep = rs.filter(_.delta < 0).map(-_.delta).sum
      assert(got(b) == ((b, arr, dep, math.min(arr, dep))),
        s"bucket $b: got ${got(b)}, want ($b, $arr, $dep, ${math.min(arr, dep)})")
    }
    assert(got.size == rows.map(_.bucket).distinct.size)
  }

  test("first decision equals the relational seed rule (bod_first_match oracle twin)") {
    // The bod_first_match oracle recomputes the matcher's seed step as two
    // row_number windows; this pins that formulation against the REAL
    // matcher on random unique-station buckets (the post-dedup shape the
    // query feeds it).
    val rnd = new Random(11)
    val cases = Seq.fill(300) {
      rnd.shuffle((1 to 20).toList).take(12).map(st => delta(
        st.toString, rnd.nextLong(61) - 30,
        -31.0 + rnd.nextDouble() * 2, -52.0 + rnd.nextDouble() * 2))
    }
    cases.foreach { rows =>
      val deps = rows.filter(_.delta < 0)
      val arrs = rows.filter(_.delta > 0)
      val want =
        if (deps.isEmpty || arrs.isEmpty) None
        else {
          val dep = deps.minBy(r => (r.delta, r.station)) // delta asc = supply desc
          val arr = arrs.minBy(a => (GeoOps.haversineMeters(
            dep.lat, dep.lon, a.lat, a.lon), a.station))
          Some(Flow(dep.station, arr.station, math.min(-dep.delta, arr.delta)))
        }
      assert(OdInference.greedyMatch(rows).headOption == want)
    }
  }

  test("firstMatches: one seed row per matchable bucket, distributed") {
    import spark.implicits._
    val rows = Seq(
      StationDelta(0L, "a", -3, 0, 0), StationDelta(0L, "b", 3, 1, 1),
      StationDelta(60L, "a", 5, 0, 0), StationDelta(60L, "c", -2, 2, 2),
      StationDelta(120L, "a", 4, 0, 0)) // arrivals only: no match emitted
    val got = OdInference.firstMatches(rows.toDS())
      .as[(Long, String, String, Long)].collect().toSet
    assert(got == Set((0L, "a", "b", 3L), (60L, "c", "a", 2L)))
  }

  test("firstKMatches is the step-numbered prefix of the matcher's emission stream") {
    import spark.implicits._
    // random multi-bucket cases: K-prefix must equal greedyMatch's first K
    // flows per bucket, in emission order, 1-based step numbering
    val k = 4
    val cases = randomCases(20).zipWithIndex.map { case (rows, b) =>
      rows.map(r => r.copy(bucket = b.toLong * 60))
    }
    val all = cases.flatten
    val got = OdInference.firstKMatches(all.toDS(), k)
      .as[(Long, Int, String, String, Long)].collect().toSet
    val want = cases.flatMap { rows =>
      OdInference.greedyMatch(rows).take(k).zipWithIndex.map {
        case (f, i) => (rows.head.bucket, i + 1, f.o, f.d, f.flow)
      }
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("distributed pipeline equals per-bucket local matcher") {
    import spark.implicits._
    val rows = Seq(
      StationDelta(0L, "a", -3, 0, 0), StationDelta(0L, "b", 3, 1, 1),
      StationDelta(60L, "a", 5, 0, 0), StationDelta(60L, "c", -2, 2, 2))
    val got = OdInference.inferFlows(rows.toDS())
      .as[(String, String, Long)].collect().toSet
    val want = (OdInference.greedyMatch(rows.filter(_.bucket == 0L)) ++
        OdInference.greedyMatch(rows.filter(_.bucket == 60L)))
      .groupBy(f => (f.o, f.d)).map { case ((o, d), fs) => (o, d, fs.map(_.flow).sum) }.toSet
    assert(got == want)
  }
}
