package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Td}

class IntervalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("points match exactly the containing intervals, inclusive bounds") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:30:00")), // inside iv A
      (2L, 10L, ts("2024-01-01 11:00:00")), // exactly at A's end -> inclusive
      (3L, 10L, ts("2024-01-01 12:30:00")), // in the gap -> no match
      (4L, 20L, ts("2024-01-01 10:30:00"))  // other key, no intervals
    ).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (10L, "A", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (10L, "B", ts("2024-01-01 13:00:00"), ts("2024-01-01 14:00:00"))
    ).toDF("user_id", "iv_id", "s_start", "s_end")
    val got = IntervalJoin.pointInInterval(points, intervals,
        "user_id", "ts", "s_start", "s_end", bucketMinutes = 15)
      .select("event_id", "iv_id").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "A"), (2L, "A")))
  }

  test("a pair meets in exactly one bucket: no duplicate output rows") {
    // interval spans many buckets; the contained point must appear once
    val points = Seq((1L, 10L, ts("2024-01-01 10:07:00"))).toDF("event_id", "user_id", "ts")
    val intervals = Seq((10L, "A", ts("2024-01-01 08:00:00"), ts("2024-01-01 20:00:00")))
      .toDF("user_id", "iv_id", "s_start", "s_end")
    val got = IntervalJoin.pointInInterval(points, intervals,
      "user_id", "ts", "s_start", "s_end", bucketMinutes = 5)
    assert(got.count() == 1)
  }

  test("random overlapping intervals match the brute-force reference, incl. boundary hits") {
    // seeded random intervals that OVERLAP within a key (unlike sessions),
    // plus points snapped to a coarse grid so boundary-equal hits occur
    val rnd = new scala.util.Random(77)
    val pointRows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(6).toLong, new Timestamp(rnd.nextInt(200) * 300000L))
    }
    val ivRows = (1 to 80).map { i =>
      val start = rnd.nextInt(180) * 300000L
      (rnd.nextInt(6).toLong, s"iv$i",
        new Timestamp(start), new Timestamp(start + (1 + rnd.nextInt(30)) * 300000L))
    }
    val points = pointRows.toDF("event_id", "user_id", "ts")
    val intervals = ivRows.toDF("user_id", "iv_id", "s_start", "s_end")
    val got = IntervalJoin.pointInInterval(points, intervals,
        "user_id", "ts", "s_start", "s_end", bucketMinutes = 17)
      .select("event_id", "iv_id").as[(Long, String)].collect()
    // overlapping intervals -> a point can match several; result must be a
    // BAG equal to the reference (also proves no bucket-double-counting)
    assert(got.length == got.toSet.size)
    val expected = (for {
      (pid, pk, pt) <- pointRows
      (ik, iv, s, e) <- ivRows
      if ik == pk && !pt.before(s) && !pt.after(e)
    } yield (pid, iv)).toSet
    assert(got.toSet == expected && expected.nonEmpty)
  }

  test("a dirty interval past maxBucketsPerInterval fails fast with the span in-message") {
    // a 9999 sentinel end date at small buckets would explode to millions
    // of rows per input row; the guard must fail loudly, not OOM or
    // silently drop
    val points = Seq((1L, 10L, ts("2024-01-01 10:30:00"))).toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      (10L, "ok", ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (10L, "dirty", ts("2024-01-01 10:00:00"), ts("9999-12-31 00:00:00"))
    ).toDF("user_id", "iv_id", "s_start", "s_end")
    val e = intercept[Exception] {
      IntervalJoin.pointInInterval(points, intervals,
        "user_id", "ts", "s_start", "s_end", bucketMinutes = 15).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxBucketsPerInterval")),
      s"expected the guard's message, got: ${messages(e).mkString(" | ")}")
    // clean data at the same geometry still flows with the default cap
    val clean = IntervalJoin.pointInInterval(points,
        intervals.filter(col("iv_id") === "ok"),
        "user_id", "ts", "s_start", "s_end", bucketMinutes = 15)
      .select("iv_id").as[String].collect().toSeq
    assert(clean == Seq("ok"))
  }

  test("matches the brute-force range join on sf0.001 events sessions") {
    val ev = Td.table(spark, Sf0001, "events")
    val sessions = TimeOps.sessionize(
        ev.filter(col("event_type") =!= "purchase"),
        "user_id", "ts", gapMinutes = 1440, orderTieBreak = Seq(col("event_id")))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val got = IntervalJoin.pointInInterval(purchases, sessions,
        "user_id", "ts", "s_start", "s_end", bucketMinutes = 1440)
      .select("event_id", "session_id").as[(Long, String)].collect().toSet
    // brute force θ-join (the shape the operator exists to avoid)
    val expected = purchases.as("p")
      .join(sessions.as("s"),
        col("p.user_id") === col("s.user_id") &&
          col("p.ts") >= col("s.s_start") && col("p.ts") <= col("s.s_end"))
      .select(col("p.event_id"), col("s.session_id"))
      .as[(Long, String)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }
}
