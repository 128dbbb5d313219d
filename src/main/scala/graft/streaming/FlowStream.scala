package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.ops.{OdInference, StationDelta}
import graft.sources.Schemas

/** One finalized per-bucket inventory delta: emitted when a station's next
  * observation lands in a LATER bucket (the bucket can then no longer
  * change for that station). First closed bucket per station → delta 0
  * (quirk Q3). */
final case class ClosedBucketDelta(station_id: String, bucket: Long, delta: Long)

/** Per-station open-bucket state: the last bikes seen in the bucket that is
  * still accumulating, plus the previous closed bucket's final level. */
final case class OpenBucket(hasPrev: Boolean, prevBikes: Int, bucket: Long, bikes: Int)

/** Streaming OD-flow inference (SURVEY §2.10 extended; the streaming analog
  * of the batch `bod_flows_greedy` chain W2→W1→§2.7):
  *
  *  1. a stateful stage keyed by station turns the observation stream into
  *     finalized `(station, bucket, delta)` rows — state carries the open
  *     bucket's last observation and the previous bucket's close, so
  *     last-per-bucket dedup (W2) and the bucket-to-bucket lag diff (W1)
  *     happen incrementally, touching only new rows;
  *  2. `foreachBatch` appends the finalized deltas and recomputes flows for
  *     ONLY the buckets touched in that micro-batch (a bucket's greedy
  *     match depends on nothing outside the bucket), dynamically
  *     overwriting just those partitions of the flows table.
  *
  * A bucket's flows are therefore emitted/refined as its stations close,
  * and never change once every station has moved past it — the streaming
  * counterpart of "flows over closed windows". Each station's final
  * (still-open) bucket is not yet part of the output, exactly like an
  * unclosed window in a watermarked aggregation.
  */
object FlowStream {

  /** Stage 1: stateful bucket-close + lag-diff, keyed by station. Rows that
    * arrive for a bucket older than the station's open bucket (late data
    * after the bucket closed) are dropped — the documented watermark-style
    * trade-off; the batch path replayed over the full log is the backfill. */
  def bucketDeltas(
      stream: Dataset[StatusPoint], bucketMinutes: Int): Dataset[ClosedBucketDelta] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val w = bucketMinutes * 60L
    stream
      .groupByKey(_.station_id)
      .flatMapGroupsWithState[OpenBucket, ClosedBucketDelta](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (id: String, rows: Iterator[StatusPoint], state: GroupState[OpenBucket]) =>
          val sorted = rows.toSeq.sortBy(_.scraped_at.getTime)
          var st = state.getOption
          val out = Seq.newBuilder[ClosedBucketDelta]
          sorted.foreach { p =>
            val b = math.floorDiv(p.scraped_at.getTime / 1000L, w) * w
            st match {
              case None =>
                st = Some(OpenBucket(hasPrev = false, 0, b, p.bikes))
              case Some(s) if b == s.bucket =>
                st = Some(s.copy(bikes = p.bikes))
              case Some(s) if b > s.bucket =>
                out += ClosedBucketDelta(id, s.bucket,
                  if (s.hasPrev) (s.bikes - s.prevBikes).toLong else 0L)
                st = Some(OpenBucket(hasPrev = true, s.bikes, b, p.bikes))
              case Some(_) => () // late row for an already-closed bucket
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Full pipeline: status-snapshot JSON drops in `landingDir` → stateful
    * bucket deltas (appended to `deltasDir`) → per-touched-bucket greedy
    * flow refresh in `flowsDir` (partitioned by bucket, dynamic partition
    * overwrite so a refined bucket replaces itself idempotently).
    * `stations` is the (station_id, lat, lon) dimension (broadcast). */
  def start(
      spark: SparkSession,
      landingDir: String,
      stations: DataFrame,
      deltasDir: String,
      flowsDir: String,
      checkpointDir: String,
      bucketMinutes: Int = 10): StreamingQuery = {
    import spark.implicits._
    val stream = spark.readStream
      .schema(Schemas.stationStatus)
      .option("maxFilesPerTrigger", 1)
      .json(landingDir)
      .selectExpr("station_id", "scraped_at", "num_bikes_available AS bikes")
      .as[StatusPoint]
    val dim = stations.select(
      col("station_id").cast("string").as("station_id"),
      col("lat").cast("double"), col("lon").cast("double"))
    bucketDeltas(stream, bucketMinutes).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[ClosedBucketDelta], batchId: Long) =>
        processBatch(spark, batch, batchId, dim, deltasDir, flowsDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** One micro-batch: idempotent delta write + per-touched-bucket flow
    * refresh. foreachBatch is at-least-once — a crash between the sink
    * write and the checkpoint commit replays the batch — so deltas are
    * written partitioned by batch id with dynamic partition overwrite: a
    * replayed batch REPLACES its own partition instead of appending its
    * rows a second time (which would double every replayed station-bucket
    * delta in all future flow recomputations). Exposed for the
    * replay-idempotence spec. */
  private[streaming] def processBatch(
      spark: SparkSession,
      batch: Dataset[ClosedBucketDelta], batchId: Long,
      dim: DataFrame, deltasDir: String, flowsDir: String): Unit = {
    import spark.implicits._
    val touched = batch.select("bucket").distinct()
      .as[Long].collect() // bounded: buckets closed in ONE micro-batch
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(deltasDir)
    if (touched.nonEmpty) {
      val input: Dataset[StationDelta] = spark.read.parquet(deltasDir)
        .filter(col("bucket").isin(touched.toIndexedSeq: _*))
        .join(broadcast(dim), "station_id")
        .select(col("bucket"), col("station_id").as("station"),
          col("delta"), col("lat"), col("lon"))
        .as[StationDelta]
      OdInference.inferFlowsPerBucket(input)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(flowsDir)
    }
  }
}
