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
  *  2. `foreachBatch` journals the finalized deltas (batch_id partitions,
  *     replay-idempotent), folds them into a bucket-partitioned compaction
  *     (`<deltasDir>_by_bucket`), and recomputes flows for ONLY the
  *     buckets touched in that micro-batch (a bucket's greedy match
  *     depends on nothing outside the bucket), dynamically overwriting
  *     just those partitions of the flows table. Refresh reads prune to
  *     the touched buckets' partitions, so per-trigger cost tracks the
  *     trigger's own bucket count — not total stream history.
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
          // total deterministic order: duplicate (station, scraped_at)
          // observations tie-break on the bikes value, so the bucket's
          // closing observation never depends on iterator order. (The
          // batch/golden path breaks ties with event_id, which the status
          // stream does not carry — parity on duplicate timestamps holds
          // per this documented order, and exactly when timestamps are
          // unique, which is the GBFS scrape contract.)
          val sorted = rows.toSeq.sortBy(p => (p.scraped_at.getTime, p.bikes))
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
    // refuse a fresh/foreign checkpoint over an existing delta journal:
    // restarted batch ids would overwrite old batch partitions, and the
    // journal is the rebuild source for missing compaction buckets
    StreamGuards.requireStoreOwnership(spark, checkpointDir, deltasDir,
      "FlowStream delta journal")
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

  /** The bucket-partitioned compaction of the delta journal, derived from
    * the journal's path. The journal partitions by batch_id (what replay
    * idempotence wants to overwrite); flow refresh filters by bucket — a
    * non-partition column there, so reading the journal for a refresh
    * would scan the ENTIRE history every micro-batch, a per-trigger cost
    * growing linearly with stream age. The compaction keeps the same rows
    * partitioned by bucket, so a refresh prunes to exactly the touched
    * partitions. */
  private[streaming] def bucketDir(deltasDir: String): String =
    deltasDir.stripSuffix("/") + "_by_bucket"

  private def priorSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("station_id", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("delta", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType)))

  private def emptyPrior(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], priorSchema)

  /** Prior deltas of the touched buckets (empty on the first batch).
    *
    * Normal path: the compaction's touched partition directories are read
    * DIRECTLY (`basePath` keeps the bucket column) — per-trigger metadata
    * cost is O(touched buckets); a plain `read.parquet(dir)` would re-list
    * the entire partition tree every trigger, a driver-side cost growing
    * with stream age even though the data read is pruned.
    *
    * Healing path: a touched bucket with NO compacted partition but an
    * existing journal (a journal written before the compaction existed, or
    * a deleted derived dir) is rebuilt from the journal — an O(history)
    * read once per such bucket's first refresh; the compaction write that
    * follows makes every later refresh of it pruned again. The compaction
    * is thus a rebuildable derived artifact, never the sole copy.
    * Exposed for the pruning spec. */
  private[streaming] def priorInput(
      spark: SparkSession, deltasDir: String, touched: Seq[Long]): DataFrame = {
    import org.apache.hadoop.fs.Path
    val dir = bucketDir(deltasDir)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val (compacted, missing) = touched.partition(b => fs.exists(new Path(dir, s"bucket=$b")))
    val fromCompaction =
      if (compacted.isEmpty) emptyPrior(spark)
      else spark.read.option("basePath", dir)
        .parquet(compacted.map(b => new Path(dir, s"bucket=$b").toString): _*)
        .select(col("station_id"), col("delta").cast("long").as("delta"),
          col("bucket").cast("long").as("bucket"))
    val fromJournal =
      if (missing.isEmpty || !fs.exists(new Path(deltasDir))) emptyPrior(spark)
      else spark.read.parquet(deltasDir)
        .filter(col("bucket").isin(missing: _*))
        .select(col("station_id"), col("delta").cast("long").as("delta"),
          col("bucket").cast("long").as("bucket"))
    fromCompaction.unionByName(fromJournal)
  }

  /** One micro-batch: idempotent journal write + touched-bucket compaction
    * + per-touched-bucket flow refresh.
    *
    * foreachBatch is at-least-once — a crash between the sink writes and
    * the checkpoint commit replays the batch — so every write is
    * idempotent by construction:
    *  - the journal appends under a batch_id partition with dynamic
    *    overwrite (a replayed batch REPLACES its own partition);
    *  - the compaction merges the batch into its buckets' partitions with
    *    a (station_id, bucket) key dedup — a station closes a bucket at
    *    most once, and a replayed batch re-emits identical rows (the
    *    stateful stage's state store is versioned with the batch), so the
    *    dedup collapses the replay to a no-op;
    *  - the flows refresh dynamically overwrites exactly the touched
    *    bucket partitions, recomputed from the compaction's merged rows.
    *
    * Per-batch read cost is the touched buckets' partitions only (see
    * [[priorInput]]) — O(buckets closed this trigger), independent of
    * stream age. Exposed for the replay-idempotence spec. */
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
      val merged = batch.toDF()
        .select(col("station_id"), col("delta").cast("long").as("delta"),
          col("bucket").cast("long").as("bucket"))
        .unionByName(priorInput(spark, deltasDir, touched.toIndexedSeq))
        .dropDuplicates("station_id", "bucket")
        .localCheckpoint() // pin the merge BEFORE overwriting the partitions it read
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(bucketDir(deltasDir))
      val input: Dataset[StationDelta] = merged
        .join(broadcast(dim), "station_id")
        .select(col("bucket"), col("station_id").as("station"),
          col("delta"), col("lat"), col("lon"))
        .as[StationDelta]
      OdInference.inferFlowsPerBucket(input)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(flowsDir)
      // release the per-batch checkpoint pin — a long-running stream would
      // otherwise accumulate one pinned merged-delta copy per trigger
      graft.llm.Caches.unpersistCheckpoint(merged)
    }
  }
}
