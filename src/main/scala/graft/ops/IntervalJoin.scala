package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: every point row (key, ts) matched to
  * the interval rows (key, start, end) containing its timestamp — event→
  * session attribution, reading-in-validity-window lookups, time-versioned
  * dimension resolution.
  *
  * A literal θ-join (`p.key = i.key AND p.ts BETWEEN i.start AND i.end`)
  * plans as an equi-join on key with the range as a post-join filter —
  * O(points × intervals) rows PER KEY before filtering, which dense keys
  * cannot survive. This implementation bucketizes time instead: intervals
  * explode to the fixed-width buckets they overlap, points carry their own
  * bucket, and the join is a pure equi-join on (key, bucket) with exact
  * containment as a residual filter. Each matching pair meets in EXACTLY
  * one bucket (the point's), so no post-join dedup is needed. Join width
  * per (key, bucket) is bounded by concurrent intervals in one bucket —
  * the 100 TB shape.
  *
  * Size `bucketMinutes` to the typical interval span: each interval emits
  * span/bucket + 1 rows, so buckets much narrower than intervals inflate
  * the build side, while buckets much wider than spans raise residual-
  * filter waste. Bucket arithmetic is exact long microseconds (no double
  * rounding at bucket edges).
  *
  * `maxBucketsPerInterval` bounds the per-row explode: ONE dirty interval
  * (a 9999-12-31 sentinel end date, a swapped unit) spanning years at
  * small buckets would otherwise materialize a multi-hundred-thousand-
  * element array per row and can OOM the whole job. Exceeding the cap
  * fails fast with the offending span in the message (silently dropping a
  * valid-looking interval would corrupt results invisibly); widen the cap
  * or the bucket if the span is legitimate. NOTE the cap is in BUCKETS,
  * not time: the default (10000) is ~7 days at 1-minute buckets but ~19
  * years at daily buckets — callers running fine buckets over genuinely
  * wide intervals (already a poor geometry per the sizing note above)
  * must raise it explicitly.
  */
object IntervalJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      bucketMinutes: Int, maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketMinutes > 0, s"pointInInterval: bucketMinutes must be positive, got $bucketMinutes")
    require(maxBucketsPerInterval > 0,
      s"pointInInterval: maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.filterNot(_ == key).toSet)
    require(overlap.isEmpty,
      s"pointInInterval: overlapping non-key columns ${overlap.mkString(", ")} — rename one side")
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "pointInInterval: column __b is reserved")
    val wUs = bucketMinutes * 60L * 1000000L
    def bucketStart(c: Column): Column =
      unix_micros(c) - pmod(unix_micros(c), lit(wUs))
    val p = points.withColumn("__b", bucketStart(col(tsCol))).as("p")
    // inverted (end < start) or null-bounded intervals contain nothing
    // under BETWEEN semantics; dropping them up front keeps one dirty row
    // from crashing the job on sequence()'s bounds check
    // assert_true returns null on success (the when() then takes the
    // sequence branch) and raises with the span in-message otherwise —
    // the guard rides the row pipeline, no extra pass
    val nBuckets =
      (bucketStart(col(endCol)) - bucketStart(col(startCol))) / lit(wUs) + lit(1L)
    val iv = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__b", explode(when(
        assert_true(nBuckets <= lit(maxBucketsPerInterval), concat(
          lit("pointInInterval: interval spans "), nBuckets,
          lit(s" buckets > maxBucketsPerInterval=$maxBucketsPerInterval" +
            s" at bucketMinutes=$bucketMinutes ["), col(startCol), lit(", "),
          col(endCol), lit("] — dirty interval, or widen the cap/bucket"))).isNull,
        sequence(bucketStart(col(startCol)), bucketStart(col(endCol)), lit(wUs)))))
      .as("i")
    p.join(iv,
        col(s"p.$key") === col(s"i.$key") && col("p.__b") === col("i.__b") &&
          col(s"p.$tsCol") >= col(s"i.$startCol") &&
          col(s"p.$tsCol") <= col(s"i.$endCol"))
      .select(points.columns.toIndexedSeq.map(c => col(s"p.$c")) ++
        intervals.columns.toIndexedSeq.filterNot(_ == key).map(c => col(s"i.$c")): _*)
  }
}
