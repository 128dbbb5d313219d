package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Td}

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before, inclusive on equal ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after r2
      (2L, 10L, ts("2024-01-01 08:00:00")), // exactly at r1 -> inclusive
      (3L, 10L, ts("2024-01-01 07:00:00")), // before everything -> null
      (4L, 20L, ts("2024-01-01 12:00:00"))  // other key, no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 08:00:00")),
      (101L, 10L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "ts")
      .select(col("event_id"), col("asof.event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(101L), 2L -> Some(100L), 3L -> None, 4L -> None))
  }

  test("equal right timestamps dedup deterministically by the tie-break (greatest wins)") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00")),
      (103L, 10L, ts("2024-01-01 09:00:00")),
      (101L, 10L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
        rightTieBreak = Seq(col("event_id")))
      .select(col("asof.event_id")).as[Long].head()
    assert(got == 103L)
  }

  test("matches the brute-force argmax on sf0.001 events (click -> latest view)") {
    val ev = Td.table(spark, Sf0001, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "event_id")
    val got = AsOfJoin.asOf(clicks, views, "user_id", "ts", "ts",
        rightTieBreak = Seq(col("event_id")))
      .select(col("event_id"), col("asof.event_id"))
      .as[(Long, Option[Long])].collect().toMap
    // brute force: argmax over the inequality join (fine at spec scale;
    // the operator exists so production never runs this shape). Rank by
    // exact nanoseconds — Timestamp.getTime is millisecond precision and
    // would mis-rank candidates differing only below the millisecond.
    def ns(t: Timestamp): Long = t.getTime / 1000 * 1000000000L + t.getNanos
    val v = views.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val expected = clicks.collect().map { c =>
      val (id, u, t) = (c.getLong(0), c.getLong(1), c.getTimestamp(2))
      val best = v.filter(x => x._1 == u && !x._2.after(t))
        .sortBy(x => (ns(x._2), x._3)).lastOption
      id -> best.map(_._3)
    }.toMap
    assert(got == expected)
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty) ||
      got.values.forall(_.isDefined))
  }

  test("null timestamps: right nulls never match, left nulls get no match") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, null.asInstanceOf[Timestamp])
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, null.asInstanceOf[Timestamp]), // must never be carried
      (101L, 10L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "ts")
      .select(col("event_id"), col("asof.event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(101L), 2L -> None))
  }

  test("null keys: NULL = NULL never matches; null-key left rows pass through unmatched") {
    // join semantics, not window semantics: a null-key right row must not
    // be carried into null-key left rows just because nulls co-partition
    val left = Seq(
      (1L, Option(10L), ts("2024-01-01 10:00:00")),
      (2L, Option.empty[Long], ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, Option.empty[Long], ts("2024-01-01 09:00:00")), // never matches
      (101L, Option(10L), ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "ts")
      .select(col("event_id"), col("asof.event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(101L), 2L -> None))
  }

  test("random timelines with duplicate timestamps match the brute-force reference") {
    // seeded random streams, coarse timestamps so duplicate ts (within and
    // across sides) are common — the edge the ordering contract exists for
    val rnd = new scala.util.Random(4242)
    val leftRows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(8).toLong, new Timestamp(rnd.nextInt(50) * 60000L))
    }
    val rightRows = (1000 to 1300).map { i =>
      (i.toLong, rnd.nextInt(8).toLong, new Timestamp(rnd.nextInt(50) * 60000L))
    }
    val left = leftRows.toDF("event_id", "user_id", "ts")
    val right = rightRows.toDF("event_id", "user_id", "ts")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
        rightTieBreak = Seq(col("event_id")))
      .select(col("event_id"), col("asof.event_id"))
      .as[(Long, Option[Long])].collect().toMap
    val expected = leftRows.map { case (id, k, t) =>
      val best = rightRows
        .filter(r => r._2 == k && !r._3.after(t))
        .sortBy(r => (r._3.getTime, r._1)).lastOption
      id -> best.map(_._1)
    }.toMap
    assert(got == expected)
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("the plan shuffles once on the key — no inequality join blowup") {
    val ev = Td.table(spark, Sf0001, "events")
    val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view").select("user_id", "ts", "event_id")
    val df = AsOfJoin.asOf(clicks, views, "user_id", "ts", "ts")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "as-of must not plan a join operator at all")
    val shuffles = plan.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
    }
    assert(shuffles.length <= 1, s"expected a single key shuffle, got ${shuffles.length}")
  }
}
