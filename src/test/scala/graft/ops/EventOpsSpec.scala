package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFillHourly: dense spine, forward fill, last-obs-per-hour by tie-break") {
    val ev = Seq(
      // user 1: obs at 00 (two rows in the hour - later ts wins) and 03
      (1L, ts("2024-01-01 00:10:00"), 10.0, 100L),
      (1L, ts("2024-01-01 00:50:00"), 11.0, 101L),
      (1L, ts("2024-01-01 03:05:00"), 12.0, 102L),
      // user 2: single observation -> single spine row
      (2L, ts("2024-01-01 07:00:00"), 5.0, 103L)
    ).toDF("user_id", "ts", "value", "event_id")
    val got = EventOps.gapFillHourly(ev, "user_id", "ts", "value", "event_id")
      .as[(Long, Timestamp, Double, Boolean)].collect().sortBy(r => (r._1, r._2.getTime))
    assert(got.toSeq == Seq(
      (1L, ts("2024-01-01 00:00:00"), 11.0, true), // later obs in hour wins
      (1L, ts("2024-01-01 01:00:00"), 11.0, false), // forward-filled
      (1L, ts("2024-01-01 02:00:00"), 11.0, false),
      (1L, ts("2024-01-01 03:00:00"), 12.0, true),
      (2L, ts("2024-01-01 07:00:00"), 5.0, true)))
  }

  test("gapFillHourly: equal-ts tie falls to the tie column") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0, 7L),
      (1L, ts("2024-01-01 00:00:00"), 2.0, 9L) // higher event_id wins
    ).toDF("user_id", "ts", "value", "event_id")
    val got = EventOps.gapFillHourly(ev, "user_id", "ts", "value", "event_id")
      .as[(Long, Timestamp, Double, Boolean)].collect()
    assert(got.toSeq == Seq((1L, ts("2024-01-01 00:00:00"), 2.0, true)))
  }

  test("gapFillHourly: dirty wide span fails loudly, not silently huge") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0, 1L),
      (1L, ts("9999-12-31 00:00:00"), 2.0, 2L)
    ).toDF("user_id", "ts", "value", "event_id")
    val e = intercept[Exception] {
      EventOps.gapFillHourly(ev, "user_id", "ts", "value", "event_id").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("spans more than")))
  }

  test("funnelStages: order matters - a click before the first view does not convert") {
    val ev = Seq(
      // u1: full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2: click precedes the only view -> stuck at stage 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3: purchase between view and click -> stage 2 (purchase must
      // follow the click, not just the view)
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:30:00"), "purchase"),
      (3L, ts("2024-01-01 11:00:00"), "click"),
      // u4: no view at all -> stage 0
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.funnelStages(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("funnelStages: a second later view can still rescue the chain") {
    // view -> click(before it? no, after first view) ... specifically:
    // first view at 10, click at 09 ignored, second click at 11 converts.
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.funnelStages(ev, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .select("user_id", "stage", "first_click")
      .as[(Long, Int, Timestamp)].collect()
    assert(got.toSeq == Seq((1L, 2, ts("2024-01-01 11:00:00"))))
  }

  test("windowedFunnelStages: the gap boundary is inclusive; one second past it stalls the stage") {
    val ev = Seq(
      // u1: click exactly AT the 1h boundary -> converts (<=)
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      // u2: click one second past the window -> stalls at stage 1
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:01"), "click"),
      // u3: in-window click, purchase in-window OF THE CLICK though far
      // from the view -> full conversion (windows chain stage-to-stage)
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:50:00"), "click"),
      (3L, ts("2024-01-01 11:40:00"), "purchase"),
      // u4: first-touch anchoring — the early click anchors the window,
      // and the purchase inside the LATER click's window does not convert
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-01 10:10:00"), "click"),
      (4L, ts("2024-01-01 12:00:00"), "click"),
      (4L, ts("2024-01-01 12:30:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventOps.windowedFunnelStages(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSec = 3600L)
      .select("user_id", "stage").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 2, 2L -> 1, 3L -> 3, 4L -> 2))
  }

  test("cohortRetention: offsets are exact 7-day periods from the first event") {
    val ev = Seq(
      // u1 first event Wed Jan 3 -> cohort Mon Jan 1; active again 6 days
      // later (offset 0) and 8 days later (offset 1)
      (1L, ts("2024-01-03 12:00:00")),
      (1L, ts("2024-01-09 12:00:00")),
      (1L, ts("2024-01-11 13:00:00")),
      // u2 first event Mon Jan 8 -> cohort Mon Jan 8, one later week
      (2L, ts("2024-01-08 00:00:00")),
      (2L, ts("2024-01-15 00:00:00"))
    ).toDF("user_id", "ts")
    val got = EventOps.cohortRetention(ev, "user_id", "ts")
      .as[(Timestamp, Long, Long)].collect().sortBy(r => (r._1.getTime, r._2))
    assert(got.toSeq == Seq(
      (ts("2024-01-01 00:00:00"), 0L, 1L),
      (ts("2024-01-01 00:00:00"), 1L, 1L),
      (ts("2024-01-08 00:00:00"), 0L, 1L),
      (ts("2024-01-08 00:00:00"), 1L, 1L)))
  }
}
