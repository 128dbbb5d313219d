package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches the reference interleave bit-for-bit") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 65535L),
      (12345L, 54321L), (1L << 20, 7L) /* masked: only low 16 bits survive */)
    val got = rows.toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 16).as("z")).as[Long].collect()
    val want = rows.map { case (a, b) => ZOrder.zValueRef(a, b, 16) }
    assert(got.toSeq == want)
    // hand-checked anchor: a=0b101(5), b=0b011(3) → z bits (b2 a2 b1 a1 b0 a0)
    // = 0 1 1 0 1 1 = 27
    assert(ZOrder.zValueRef(5L, 3L, 16) == 27L)
  }

  test("interleave is a bijection: deinterleaving z recovers both masked dims") {
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var a = 0L; var b = 0L; var i = 0
      while (i < bits) {
        a |= ((z >> (2 * i)) & 1L) << i
        b |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (a, b)
    }
    // deterministic pseudo-random pairs (fixed LCG, no RNG state)
    var x = 12345L
    (1 to 500).foreach { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      val a = (x >>> 17) & 0xFFFF
      val b = (x >>> 41) & 0xFFFF
      val z = ZOrder.zValueRef(a, b, 16)
      assert(deinterleave(z, 16) == ((a, b)), s"roundtrip failed for ($a,$b)")
    }
  }

  test("z-sorted layout prunes row groups on BOTH dimensions; single-column sort does not") {
    // events sorted by ts: every file spans all users, so a user predicate
    // prunes nothing. Sorted by z(user, hour): files are rectangles in
    // (user, hour) space and the SAME pushed user predicate skips most row
    // groups. Scan numOutputRows counts rows surviving row-group pruning
    // (record-level parquet filtering is off by default), which is exactly
    // the quantity z-ordering improves.
    // 200k synthetic rows, user decorrelated from hour (multiplicative
    // cycle). Sizing matters and is the lesson: a contiguous z range of
    // length 2^k leaves the low k interleaved bits free, so a row group
    // only pins a dimension's HIGH bits when its z extent is small
    // relative to the curve. 8-bit dims (z < 2^16) over 64 files → each
    // file spans z extent 2^10, pinning the top 3 user bits → a low-user
    // predicate keeps ~1/8 of the row groups. (At 100 TB: pick bits to
    // match dim cardinality and row-group count, same arithmetic.)
    val n = 200000L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      (col("id") % 256).as("user_id"),      // fast cycle
      (col("id").divide(256).cast("long") % 256).as("hr")) // slow cycle — independent of user
    val dir = Fixtures.tempDir("zorder")
    def write(df: org.apache.spark.sql.DataFrame, sort: org.apache.spark.sql.Column, path: String): Unit =
      df.repartitionByRange(64, sort).sortWithinPartitions(sort)
        .write.mode("overwrite").parquet(s"$dir/$path")
    write(ev, col("hr"), "by_time")
    write(ev.withColumn("z", ZOrder.zValue(col("user_id"), col("hr"), 8)), col("z"), "by_z")

    def rowsScanned(path: String): Long = {
      val df = spark.read.parquet(s"$dir/$path").filter(col("user_id") < 10)
      df.collect() // run to populate metrics
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = plan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      assert(scans.head.metadata("PushedFilters").contains("LessThan(user_id,10)"))
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val full = spark.read.parquet(s"$dir/by_time").count()
    val timeRows = rowsScanned("by_time")
    val zRows = rowsScanned("by_z")
    // time-sorted layout: user_id spans the whole range in every row group
    // → pruning is ineffective (reads ~everything). z-sorted: most row
    // groups' user_id min exceeds 10 → skipped.
    assert(timeRows > full / 2,
      s"expected time-sorted layout to read most rows, read $timeRows of $full")
    assert(zRows < timeRows / 4,
      s"z-layout should prune at least 4x vs time layout: z=$zRows time=$timeRows")
  }

  test("layoutAudit: exact file/row counts on the full 64x64 grid") {
    // all 4096 (a, b) combos with a, b in 0..63 and 16 files per layout:
    //   by_a files   = a-ranges of width 4, b spanning 0..63 everywhere
    //   zorder files = 256 consecutive z = one 16x16 (a, b) block
    val pts = (for (a <- 0L to 63L; b <- 0L to 63L) yield (a, b)).toDF("a", "b")
    val preds = Seq(
      (0L, 0L, 63L, 0L, 15L),  // b-only quarter: by_a cannot prune, zorder can
      (1L, 0L, 15L, 0L, 63L),  // a-only quarter: both prune equally
      (2L, 0L, 15L, 0L, 15L))  // 2d box: zorder strictly better
      .toDF("pred_id", "a_lo", "a_hi", "b_lo", "b_hi")
    val got = ZOrder.layoutAudit(pts, "a", "b", preds, groups = 16, bits = 16)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    graft.llm.Caches.releaseAll(spark)
    // (n_groups, groups_scanned, rows_scanned, rows_matched)
    assert(got(("by_a", 0L)) == ((16L, 16L, 4096L, 1024L)))   // reads everything
    assert(got(("zorder", 0L)) == ((16L, 4L, 1024L, 1024L)))  // 4x fewer rows
    assert(got(("by_a", 1L)) == ((16L, 4L, 1024L, 1024L)))
    assert(got(("zorder", 1L)) == ((16L, 4L, 1024L, 1024L)))
    assert(got(("by_a", 2L)) == ((16L, 4L, 1024L, 256L)))
    assert(got(("zorder", 2L)) == ((16L, 1L, 256L, 256L)))    // one perfect file
  }

  test("layoutAudit: zero-overlap predicates are kept with zeros") {
    val pts = (for (a <- 0L to 7L; b <- 0L to 7L) yield (a, b)).toDF("a", "b")
    val preds = Seq((0L, 100L, 200L, 0L, 7L)).toDF("pred_id", "a_lo", "a_hi", "b_lo", "b_hi")
    val got = ZOrder.layoutAudit(pts, "a", "b", preds, groups = 4, bits = 8)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    graft.llm.Caches.releaseAll(spark)
    assert(got.length == 2)
    assert(got.forall(r => r._4 == 0L && r._5 == 0L && r._6 == 0L))
    assert(got.forall(_._3 == 4L))
  }
}
