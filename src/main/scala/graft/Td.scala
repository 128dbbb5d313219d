package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated testdata tables (see TESTDATA.md).
  * Parquet is self-describing; no schema inference beyond the footer.
  */
object Td {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS): with nanosAsLong it arrives as int64
    // epoch-nanos; truncate to microseconds (matching DuckDB's CAST) and
    // restore TimestampType.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integer div: ns are > 2^53, float div would lose precision
    else df
  }

  /** Register every table as a temp view (S12-style catalog bootstrap). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    tables.foreach(t => table(spark, sfDir, t).createOrReplaceTempView(t))
}
