package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Upsert

/** Storage layout + catalog bootstrap (S9/S10/S11/S12, reference
  * `sql/schema.sql` + the three writers in etl_gbfs.py / etl_weather.py).
  *
  * Layout, designed for the 100 TB tier:
  *  - `stations/`   — small dimension, single parquet table, MERGE-upserted;
  *  - `status/`     — append-only parquet partitioned by `scrape_date`
  *    (partition pruning serves the reference's
  *    `idx_station_status_station_time` access path: time-range scans touch
  *    only their date partitions, min/max footer stats skip within);
  *  - `weather/`    — hour-keyed table, MERGE-upserted.
  */
final class Store(spark: SparkSession, root: String) {

  val stationsPath = s"$root/stations"
  val statusPath = s"$root/status"
  val weatherPath = s"$root/weather"

  /** S10: MERGE-upsert the stations dimension (last write wins by id). */
  def upsertStations(fresh: DataFrame): Unit =
    Upsert.mergeInto(spark, fresh, stationsPath, Seq("station_id"))

  /** S9: append a status snapshot, partitioned by scrape date. Duplicate
    * snapshots intentionally double-append (quirk Q5 — reference parity). */
  def appendStatus(snapshot: DataFrame): Unit =
    snapshot
      .withColumn("scrape_date", to_date(col("scraped_at")))
      .write.mode(SaveMode.Append)
      .partitionBy("scrape_date")
      .parquet(statusPath)

  /** S11: MERGE-upsert hourly weather (last write wins by hour). */
  def upsertWeather(fresh: DataFrame): Unit =
    Upsert.mergeInto(spark, fresh, weatherPath, Seq("time"))

  /** Quirk Q6 (SURVEY §2.13): SQLite stored whatever the ETL passed —
    * dynamic typing, no domain checks. The engine instead enforces the
    * declared constraints at ingest and QUARANTINES nonconforming rows
    * (key/timestamp present, counts non-negative-or-null) into an
    * auditable side table tagged with the violated rule, rather than
    * silently storing or silently dropping them. Returns
    * (rows appended, rows quarantined). */
  def appendStatusValidated(snapshot: DataFrame): (Long, Long) = {
    val countCols =
      Seq("num_bikes_available", "num_bikes_disabled",
        "num_docks_available", "num_docks_disabled")
    val checks: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "null_station_id" -> col("station_id").isNull,
      "null_scraped_at" -> col("scraped_at").isNull,
      "negative_count" -> countCols.map(c => col(c) < 0).reduce(_ || _))
    val reason = checks.foldRight(lit(null).cast("string")) {
      case ((name, cond), acc) => when(cond, name).otherwise(acc)
    }
    val flagged = snapshot.withColumn("_reason", reason).persist()
    try {
      val bad = flagged.filter(col("_reason").isNotNull)
      val nBad = bad.count()
      if (nBad > 0) {
        bad.write.mode(SaveMode.Append).parquet(s"$root/quarantine/status")
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"quarantined $nBad nonconforming status rows -> $root/quarantine/status")
      }
      val good = flagged.filter(col("_reason").isNull).drop("_reason")
      appendStatus(good)
      (good.count(), nBad)
    } finally {
      flagged.unpersist(): Unit
    }
  }

  /** Quarantined rows so far; empty (with the right schema) when nothing
    * has ever been quarantined — "clean ingest history" is a normal state,
    * not a missing-path error. */
  def quarantinedStatus: DataFrame = {
    val dir = s"$root/quarantine/status"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(dir)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      Schemas.stationStatus.add("_reason", org.apache.spark.sql.types.StringType))
  }

  def stations: DataFrame = spark.read.parquet(stationsPath)
  def status: DataFrame = spark.read.parquet(statusPath)
  def weather: DataFrame = spark.read.parquet(weatherPath)

  /** S12: register the three tables (+ reference-compat views) in the
    * session catalog so `spark.sql` queries run against them. */
  def bootstrapCatalog(): Unit = {
    stations.createOrReplaceTempView("stations")
    status.createOrReplaceTempView("station_status")
    weather.createOrReplaceTempView("weather_hourly")
    Gbfs.compatStationsView(stations).createOrReplaceTempView("stations_compat")
    Gbfs.compatStatusView(status).createOrReplaceTempView("station_status_compat")
  }

  /** S8: CSV cache (neighborhood lookups — streamlit_app.py:82-119). */
  def writeCsvCache(df: DataFrame, name: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", true)
      .csv(s"$root/cache_$name")

  def readCsvCache(name: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", true).csv(s"$root/cache_$name")
}
