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
