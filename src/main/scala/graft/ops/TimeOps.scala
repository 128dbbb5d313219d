package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series primitives shared by the bike-domain pipelines and the
  * generic query surface.
  *
  * Reference semantics: lag-diff `/root/reference/src/bike_analyzer/od_inference.py:51-53`,
  * bucket floor `od_inference.py:50`, hour string `/root/reference/sql/queries.sql:37`.
  */
object TimeOps {

  /** Zero-padded hour-of-day STRING ('00'..'23') — parity with STRFTIME('%H'). */
  def hourOfDay(ts: Column): Column = date_format(ts, "HH")

  /** Floor a timestamp to an n-minute bucket. Pure arithmetic on epoch
    * seconds: stays inside whole-stage codegen, no UDF. */
  def bucketFloor(ts: Column, minutes: Int): Column = {
    val width = minutes * 60L
    timestamp_seconds(floor(unix_timestamp(ts) / width) * width)
  }

  /** Optional time-range predicate, AND-combined (dynamic WHERE builder —
    * reference utils.py:38-48). Returns lit(true) when both ends absent so it
    * composes with other filters; bounds push down to the parquet scan. */
  def timeRange(ts: Column, start: Option[String], end: Option[String]): Column =
    Seq(
      start.map(s => ts >= to_timestamp(lit(s))),
      end.map(e => ts < to_timestamp(lit(e)))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))

  /** Per-partition difference vs previous row (W1). First row per partition
    * coalesces to 0 (reference diff().fillna(0)). One shuffle on
    * `partitionCols`; window sort is local within partitions. */
  def lagDiff(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      valueCol: String,
      out: String = "delta"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(out, coalesce(col(valueCol) - lag(col(valueCol), 1).over(w), lit(0.0)))
  }

  /** Keep the last row per group by `orderCols` (W2/A7 dedup). Implemented as
    * row_number over a descending window; Catalyst executes it as a single
    * shuffle + local sort, no global sort. */
  def lastPerGroup(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Gap-based sessionization: rows of one `key` whose consecutive `ts`
    * gaps stay under `gapMinutes` share a session. Two windows over the
    * SAME partitioning (key): lag to flag session starts, running sum to
    * number them — Catalyst plans a single shuffle on the key, both windows
    * evaluated in one local sort pass. Session id = `<key>#<n>` (stable,
    * join-friendly). */
  def sessionize(
      df: DataFrame, key: String, tsCol: String, gapMinutes: Int,
      orderTieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val order = col(tsCol) +: orderTieBreak
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val gap = unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(w))
    df.withColumn("__new_session",
        when(gap.isNull || gap > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_n",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("session_id", concat(col(key), lit("#"), col("session_n")))
      .drop("__new_session")
  }
}
