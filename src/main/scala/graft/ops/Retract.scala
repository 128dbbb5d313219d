package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance under DELETES (retractions) — the
  * changelog-consumer shape (CDC feeds, Flink-style retract streams) that
  * plain running totals cannot serve: sum/count fold a −1 row fine, but
  * min/max are NOT invertible (deleting the current minimum forces a
  * rescan unless an auxiliary survives). The maintained auxiliary here is
  * the per-(key, value) COUNT HISTOGRAM: a delete decrements one histogram
  * cell, and every aggregate — n, sum, min, max — re-derives from
  * surviving cells, so incremental cost is O(changelog + histogram),
  * never O(base).
  *
  * The histogram is exact-integer throughout ⇒ reduction-order-free ⇒ the
  * maintained result is hash-identical to a full recompute (the oracle
  * recomputes; the engine maintains — the merge law under deletes). A
  * retraction of a row the histogram never held drives a cell negative:
  * that is a CORRUPT changelog, and the maintenance raises loudly instead
  * of silently folding garbage into the aggregates.
  */
object Retract {

  /** Apply a (+1/−1)-counted delta to a (key, v, cnt) histogram; raises on
    * any negative surviving cell. Columns: `keyCols` ++ (v, cnt) on the
    * histogram, `keyCols` ++ (v, dcnt) on the delta. */
  def maintainHistogram(hist: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    val on = keyCols :+ "v"
    hist.join(delta, on, "full_outer")
      .select((on.map(col) :+
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L))).as("cnt")): _*)
      .withColumn("cnt", when(col("cnt") < 0,
          raise_error(concat(lit("Retract: changelog retracts a row the histogram never held (v="),
            col("v"), lit(")"))).cast("long"))
        .otherwise(col("cnt")))
      .where(col("cnt") > 0)
  }

  /** (n, sum, min, max) per key from a surviving histogram. */
  def aggFromHistogram(hist: DataFrame, keyCols: Seq[String]): DataFrame =
    hist.groupBy(keyCols.map(col): _*)
      .agg(sum(col("cnt")).cast("long").as("n"),
        sum(col("v") * col("cnt")).cast("long").as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
}
