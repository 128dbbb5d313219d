package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One observation of a station's net inventory change within a time bucket.
  * `bucket` is epoch seconds of the bucket start (grouping key). */
final case class StationDelta(
    bucket: Long, station: String, delta: Long, lat: Double, lon: Double)

/** One inferred origin→destination flow. */
final case class Flow(o: String, d: String, flow: Long)

/** Greedy OD-flow estimation — the one operator Catalyst cannot express
  * relationally (reference `/root/reference/src/bike_analyzer/od_inference.py:19-77`).
  *
  * Semantics (pinned for oracle parity):
  *  - rows within a bucket are processed in ascending station-id (string)
  *    order — the reference's pandas groupby emits groups key-sorted;
  *  - departures: delta < 0 with supply -delta; arrivals: delta > 0; 0 dropped;
  *  - loop: pick departure with the LARGEST remaining count (first wins on
  *    ties), match to its NEAREST arrival by haversine (strictly-less
  *    comparison, first wins), emit min(supply, demand), decrement both.
  *
  * Spark shape: `groupByKey(bucket).flatMapGroups` — parallel across buckets,
  * sequential within (n stations per bucket is small; the reference network
  * is 88). At scale the shuffle key is the bucket, so skew only occurs if one
  * bucket dominates — salting is unnecessary because bucket count grows with
  * data span. NOT a join, NOT a UDAF, no driver-side collect.
  */
object OdInference {

  /** Pure per-bucket matcher; exposed for property tests. */
  def greedyMatch(rows: Seq[StationDelta]): Seq[Flow] = {
    final class Node(val station: String, var count: Long, val lat: Double, val lon: Double)
    // Station order pins reference parity (unique stations per bucket after
    // W2 dedup); the remaining fields make the sort total so the matcher is
    // permutation-deterministic even on degenerate duplicate-station input.
    val sorted = rows.sortBy(r => (r.station, r.delta, r.lat, r.lon))
    val departs = ArrayBuffer.empty[Node]
    val arrives = ArrayBuffer.empty[Node]
    sorted.foreach { r =>
      if (r.delta < 0) departs += new Node(r.station, -r.delta, r.lat, r.lon)
      else if (r.delta > 0) arrives += new Node(r.station, r.delta, r.lat, r.lon)
    }
    val out = ArrayBuffer.empty[Flow]
    while (departs.nonEmpty && arrives.nonEmpty) {
      var di = 0
      var i = 1
      while (i < departs.length) { // strictly-greater keeps first-wins ties
        if (departs(i).count > departs(di).count) di = i
        i += 1
      }
      val dep = departs(di)
      var ai = 0
      var bestDist = Double.MaxValue
      i = 0
      while (i < arrives.length) { // strictly-less keeps first-wins ties
        val a = arrives(i)
        val dist = GeoOps.haversineMeters(dep.lat, dep.lon, a.lat, a.lon)
        if (dist < bestDist) { bestDist = dist; ai = i }
        i += 1
      }
      val arr = arrives(ai)
      val flow = math.min(dep.count, arr.count)
      out += Flow(dep.station, arr.station, flow)
      dep.count -= flow
      arr.count -= flow
      if (arr.count == 0L) arrives.remove(ai)
      if (dep.count == 0L) departs.remove(di)
    }
    out.toSeq
  }

  /** Per-bucket flows (bucket preserved in the output) — the incremental/
    * streaming surface: a bucket's flow rows depend only on that bucket's
    * deltas, so a changed bucket can be recomputed in isolation (see
    * [[graft.streaming.FlowStream]]). Output columns: bucket, o, d, flow. */
  def inferFlowsPerBucket(deltas: Dataset[StationDelta]): DataFrame = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .groupByKey(_.bucket)
      .flatMapGroups((b: Long, it: Iterator[StationDelta]) =>
        greedyMatch(it.toSeq).iterator.map(f => (b, f.o, f.d, f.flow)))
      .toDF("bucket", "o", "d", "flow")
  }

  /** Distributed flow inference: deltas → per-bucket greedy match → OD rollup.
    * Output columns: o, d, flow (total over all buckets). */
  def inferFlows(deltas: Dataset[StationDelta]): DataFrame =
    inferFlowsPerBucket(deltas)
      .groupBy("o", "d")
      .agg(sum("flow").as("flow"))

  /** The matcher's FIRST decision per bucket — the greedy loop's seed step,
    * which IS relationally expressible: before any flow is emitted, the
    * chosen departure is the bucket-global argmax of supply (ties → first
    * in the station-string sort order the matcher processes rows in), its
    * match the argmin of haversine distance over the bucket's arrivals
    * (ties → same station-string order), and the emitted flow
    * min(supply, demand). A DuckDB twin (two row_number windows over the
    * delta table + the identically-spelled IEEE haversine) therefore
    * hash-checks the seed decision of every bucket, narrowing the
    * golden-only surface to the iteration TAIL (decisions 2..n, whose
    * inputs depend on prior decrements). Runs the real matcher — not a
    * reimplementation — so a semantics drift in [[greedyMatch]] shows up
    * here first. Output: bucket, o, d, flow; buckets with no match emit
    * nothing. */
  def firstMatches(deltas: Dataset[StationDelta]): DataFrame = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .groupByKey(_.bucket)
      .flatMapGroups((b: Long, it: Iterator[StationDelta]) =>
        greedyMatch(it.toSeq).headOption.map(f => (b, f.o, f.d, f.flow)).iterator)
      .toDF("bucket", "o", "d", "flow")
  }

  /** The matcher's first `k` decisions per bucket, step-numbered — the
    * generated-CTE unroll surface. Decision 1 is [[firstMatches]]'s seed;
    * each later decision is the same (argmax supply, argmin haversine,
    * emit min) over the PREVIOUS state with the picked pair decremented
    * and zero-count nodes dropped. Removal never reorders survivors
    * (ArrayBuffer.remove is order-preserving and insertion order is the
    * station sort), so "station-string order among rows with remaining
    * count > 0" stays the scan order at every step — which makes each
    * decision relationally expressible given the prior one, and the first
    * K decisions of every bucket hash-checkable against a DuckDB
    * iterated-CTE twin. Runs the REAL matcher (a prefix of its emission
    * stream), not a reimplementation. Output: bucket, step (1-based),
    * o, d, flow. */
  def firstKMatches(deltas: Dataset[StationDelta], k: Int): DataFrame = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .groupByKey(_.bucket)
      .flatMapGroups((b: Long, it: Iterator[StationDelta]) =>
        greedyMatch(it.toSeq).take(k).zipWithIndex.iterator.map {
          case (f, i) => (b, i + 1, f.o, f.d, f.flow)
        })
      .toDF("bucket", "step", "o", "d", "flow")
  }

  /** Per-bucket conservation summary — the matcher's oracle-checkable
    * surface. For every bucket: total arrival demand (Σ delta>0), total
    * departure supply (Σ -delta for delta<0), and the total flow the greedy
    * matcher ACTUALLY emitted. The emitted total is provably exactly
    * `min(arrivals, departures)`: every emission decrements both remaining
    * totals by the same amount, a node leaves its list only at count 0, and
    * the loop terminates precisely when one side's remaining total reaches
    * zero (reference loop: `od_inference.py:39-43`). A relational twin can
    * therefore pin `flow_total` from the deltas alone, which makes the
    * whole upstream pipeline AND the matcher's conservation law
    * hash-checkable; only the pairwise ASSIGNMENT stays on golden/property
    * evidence. Single pass: bounds and match run in the same per-bucket
    * group, so this costs one bucket shuffle, not two branches over the
    * delta pipeline. */
  def flowInvariants(deltas: Dataset[StationDelta]): DataFrame = {
    val spark = deltas.sparkSession
    import spark.implicits._
    deltas
      .groupByKey(_.bucket)
      .mapGroups { (b: Long, it: Iterator[StationDelta]) =>
        val rows = it.toSeq
        val arrivals = rows.iterator.filter(_.delta > 0).map(_.delta).sum
        val departures = rows.iterator.filter(_.delta < 0).map(-_.delta).sum
        val total = greedyMatch(rows).iterator.map(_.flow).sum
        (b, arrivals, departures, total)
      }
      .toDF("bucket", "arrivals", "departures", "flow_total")
  }
}
