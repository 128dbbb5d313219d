package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond sessionization ([[TimeOps.sessionize]]):
  * time-series gap-fill/resample, ordered funnel conversion, and cohort
  * retention — the product-analytics staples a reference user would reach
  * for next, each shaped for one-shuffle-per-semantic-step execution.
  */
object EventOps {

  /** Per-key hourly resample with forward fill: build each key's dense hour
    * spine from its own min..max timestamp, keep the LAST observation per
    * (key, hour) — deterministic under ties via (ts, tieCol) DESC — and
    * carry the previous value across empty hours.
    *
    * Output: key, hour, value (forward-filled; never null because the spine
    * starts at an observed hour), is_observed.
    *
    * Scale shape: the per-hour "last obs" is a (key, hour)-partitioned
    * row_number (the hour component keeps partitions small even for a
    * viral key); the spine explode is bounded by `maxSpineHours` with a
    * loud `raise_error` — one dirty year-9999 timestamp would otherwise
    * quietly build a 70M-row array for that key (the [[IntervalJoin]]
    * explode-cap lesson); the fill window partitions by key alone, whose
    * row count after resampling is spine-bounded, not event-bounded. */
  def gapFillHourly(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieCol: String, maxSpineHours: Long = 200000L): DataFrame = {
    val ev = events.select(
      col(keyCol).as("k"), col(tsCol).as("ts"), col(valueCol).as("v"),
      col(tieCol).as("tie"))
    val obs = ev
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("k", "hour")
          .orderBy(col("ts").desc, col("tie").desc)))
      .filter(col("rn") === 1)
      .select(col("k"), col("hour"), col("v"))
    val spine = ev.groupBy("k")
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .withColumn("h1",
        when((unix_timestamp(col("h1")) - unix_timestamp(col("h0"))) / 3600L
            <= maxSpineHours, col("h1"))
          .otherwise(raise_error(concat(
            lit(s"gapFillHourly: key "), col("k").cast("string"),
            lit(s" spans more than $maxSpineHours hours — dirty timestamp?" +
              " Filter the input or raise maxSpineHours.")))))
      .select(col("k"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
          .as("hour"))
    spine.join(obs, Seq("k", "hour"), "left")
      .withColumn("is_observed", col("v").isNotNull)
      .withColumn("v", last(col("v"), ignoreNulls = true).over(
        Window.partitionBy("k").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("k").as(keyCol), col("hour"),
        col("v").as(valueCol), col("is_observed"))
  }

  /** Strict-order funnel: per key, the first `stages(0)` event, then the
    * first `stages(1)` event strictly AFTER it, then the first `stages(2)`
    * strictly after that, etc. A click before any view does not convert —
    * that ordering constraint is what separates a funnel from a pivot
    * count (`a13`).
    *
    * Output: key, stage (0..stages.length reached), first_<stage> timestamp
    * per stage (null once the chain breaks).
    *
    * Scale shape: each stage is a conditional min window over the SAME
    * key partition — Catalyst stacks the Window operators over one
    * exchange — and the final per-key collapse reuses that partitioning
    * (no second shuffle). */
  def funnelStages(
      events: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelStages: need at least one stage")
    val w = Window.partitionBy("k")
    val base = events.select(
      col(keyCol).as("k"), col(tsCol).as("ts"), col(typeCol).as("et"))
    val withFirsts = stages.zipWithIndex.foldLeft(base) {
      case (df, (stage, i)) =>
        val cond: Column =
          if (i == 0) col("et") === stage
          else col("et") === stage && col("ts") > col(s"f${i - 1}")
        df.withColumn(s"f$i", min(when(cond, col("ts"))).over(w))
    }
    val firstCols = stages.indices.map(i =>
      min(col(s"f$i")).as(s"first_${stages(i)}"))
    // fold low→high so the LAST when wrapped is outermost: deepest stage wins
    val stageExpr = stages.indices.foldLeft(lit(0)) { (acc, i) =>
      when(min(col(s"f$i")).isNotNull, i + 1).otherwise(acc)
    }
    withFirsts.groupBy(col("k").as(keyCol))
      .agg(stageExpr.cast("int").as("stage"), firstCols: _*)
  }

  /** [[funnelStages]] with a CONVERSION WINDOW — the product-analytics
    * funnel semantic: stage i+1 counts only within `maxGapSec` of stage
    * i's first occurrence, so a purchase a week after the click no longer
    * converts. First-touch anchoring like the unbounded form (each stage
    * anchors at its FIRST in-window occurrence; a later stage-i event
    * that would have enabled a conversion the first one missed does not
    * re-anchor — the deterministic, oracle-replayable choice). Interval
    * arithmetic is exact integer microseconds on both engines. Same scale
    * shape: stages-many cascaded min windows over ONE key exchange. */
  def windowedFunnelStages(
      events: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      stages: Seq[String], maxGapSec: Long): DataFrame = {
    require(stages.nonEmpty, "windowedFunnelStages: need at least one stage")
    require(maxGapSec > 0, s"maxGapSec must be positive: $maxGapSec")
    val w = Window.partitionBy("k")
    val base = events.select(
      col(keyCol).as("k"), col(tsCol).as("ts"), col(typeCol).as("et"))
    val withFirsts = stages.zipWithIndex.foldLeft(base) {
      case (df, (stage, i)) =>
        val cond: Column =
          if (i == 0) col("et") === stage
          else col("et") === stage && col("ts") > col(s"f${i - 1}") &&
            col("ts") <= col(s"f${i - 1}") + expr(s"INTERVAL $maxGapSec SECOND")
        df.withColumn(s"f$i", min(when(cond, col("ts"))).over(w))
    }
    val firstCols = stages.indices.map(i =>
      min(col(s"f$i")).as(s"first_${stages(i)}"))
    val stageExpr = stages.indices.foldLeft(lit(0)) { (acc, i) =>
      when(min(col(s"f$i")).isNotNull, i + 1).otherwise(acc)
    }
    withFirsts.groupBy(col("k").as(keyCol))
      .agg(stageExpr.cast("int").as("stage"), firstCols: _*)
  }

  /** Weekly cohort retention: cohort = Monday-truncated week of the key's
    * first event; week_offset = whole 7-day periods since that first event
    * (exact integer microsecond arithmetic — calendar-free, so every
    * engine computes the identical bucket); active_users = distinct keys
    * from that cohort active at that offset.
    *
    * Scale shape: first-event via a key-partitioned min window (one
    * shuffle), then a hash agg with exact distinct on (cohort, offset) —
    * cohort×offset cardinality is weeks², never data-sized. */
  def cohortRetention(
      events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val weekUs = 7L * 24 * 3600 * 1000000L
    events
      .select(col(keyCol).as("k"), col(tsCol).as("ts"))
      .withColumn("fts", min(col("ts")).over(Window.partitionBy("k")))
      .withColumn("diff_us", unix_micros(col("ts")) - unix_micros(col("fts")))
      .select(
        date_trunc("week", col("fts")).as("cohort_week"),
        // integer division (Column./ would be an IEEE divide; `div` keeps
        // the bucket exact and identical to the oracle's `//`)
        expr(s"diff_us div ${weekUs}L").as("week_offset"),
        col("k"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("k").as("active_users"))
  }
}
