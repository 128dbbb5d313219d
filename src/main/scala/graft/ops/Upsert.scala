package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** MERGE-style upsert without a transactional table format (reference
  * semantics: INSERT .. ON CONFLICT(key) DO UPDATE,
  * `/root/reference/src/bike_analyzer/etl_gbfs.py:74-95`,
  * `etl_weather.py:52-71`): fresh rows win by key, otherwise keep old.
  *
  * Scale: one hash shuffle on the key columns (both sides co-partitioned by
  * the same exchange), window-dedup within partitions — no global sort, no
  * driver materialization. At 100 TB the rewrite becomes `MERGE INTO` on a
  * lakehouse format; this module is the seam where that lands.
  */
object Upsert {

  private val PrecedenceCol = "__graft_precedence"

  /** Last-write-wins merge: rows of `fresh` replace rows of `old` sharing the
    * same key tuple; non-conflicting rows of both survive. Column sets must
    * match (unionByName). */
  def merge(old: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame = {
    val unioned = old.withColumn(PrecedenceCol, lit(0))
      .unionByName(fresh.withColumn(PrecedenceCol, lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(PrecedenceCol).desc)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", PrecedenceCol)
  }

  /** Slowly-changing-dimension Type 2 history build: collapse an ordered
    * change stream into validity intervals. Consecutive rows with the SAME
    * tracked value fold into one interval; a value change closes the open
    * interval (valid_to = next version's start) and opens a new one; the
    * key's last interval stays open (valid_to null, is_current true) — the
    * warehouse-standard dimension-history shape the reference's
    * upsert-overwrite model cannot answer ("what was this station's name
    * LAST month?").
    *
    * Scale shape: both the change-detection lag and the interval-closing
    * lead partition by the key — Catalyst stacks them over ONE exchange
    * (the second window runs on the filtered version starts, same
    * partitioning, no new shuffle). Ordering ties on `tsCol` break by
    * `tieCol` so replayed logs build identical history.
    *
    * Output: key, tracked value, valid_from, valid_to, is_current. */
  def scd2(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("vf"), col("tie"))
    events
      .select(col(keyCol).as("k"), col(tsCol).as("vf"),
        col(valueCol).as("v"), col(tieCol).as("tie"))
      .withColumn("prev", lag(col("v"), 1).over(w))
      // first-row marker distinct from "previous value was null": a stream
      // opening with two null values must still collapse them into one
      // interval, so has-no-predecessor is detected by lagging a constant
      .withColumn("has_prev", lag(lit(1), 1).over(w))
      // null-safe inequality: a null tracked value still versions correctly
      .filter(col("has_prev").isNull || !(col("prev") <=> col("v")))
      .withColumn("valid_to", lead(col("vf"), 1).over(w))
      .select(col("k").as(keyCol), col("v").as(valueCol),
        col("vf").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Atomically replace the parquet table at `target` with `df`:
    * write to a temp sibling dir, then rename over the old one. Readers see
    * either the old or the new table, never a partial write. */
  def atomicReplace(spark: SparkSession, df: DataFrame, target: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val targetPath = new Path(target)
    val fs = targetPath.getFileSystem(conf)
    val tmp = new Path(target + ".__tmp_" + System.nanoTime())
    val bak = new Path(target + ".__old_" + System.nanoTime())
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(targetPath)) fs.rename(targetPath, bak)
    fs.rename(tmp, targetPath)
    if (fs.exists(bak)) fs.delete(bak, true)
  }

  /** Read-merge-rewrite a keyed parquet table (creates it if absent). */
  def mergeInto(spark: SparkSession, fresh: DataFrame, target: String, keys: Seq[String]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(target).getFileSystem(conf)
    if (!fs.exists(new Path(target))) {
      df2parquet(fresh, target)
    } else {
      val old = spark.read.parquet(target)
      atomicReplace(spark, merge(old, fresh, keys), target)
    }
  }

  private def df2parquet(df: DataFrame, target: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(target)
}
