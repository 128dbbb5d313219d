package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Start-time ownership guards shared by every stream that keeps a
  * DURABLE batch_id-stamped sink or store — both the read-back stores
  * (journal / ledger / summary log: [[GraphStream]], [[ContaminationStream]],
  * [[DriftStream]], [[FlowStream]]) and the write-only accumulating sinks
  * ([[CurationStream]], [[NearDupStream]], [[PackingStream]],
  * [[BatchingStream]], [[ContamStream]], [[ChainStream]]'s tiers,
  * [[RetractStream]], [[VectorStream]]).
  *
  * The hazard: foreachBatch batch ids are PER-CHECKPOINT. If a stream is
  * restarted with a fresh (or deleted) checkpoint over an existing store —
  * a common ops move — batch ids restart at 0 and the new batch 0
  * silently dynamic-overwrites the old `batch_id=0` partition; the next
  * rebuild-from-journal then permanently drops the lost rows with no
  * error. A crash REPLAY is different and legitimate: the checkpoint's
  * offsets log already names the batch (offsets/N is written before
  * foreachBatch runs batch N), so replay overwrites a partition its own
  * checkpoint owns.
  *
  * The guard distinguishes exactly those two cases: every `batch_id=`
  * partition in the store must be named by the checkpoint's offsets log.
  * A store partition beyond the log's max batch means the store was
  * written by a DIFFERENT checkpoint — refuse loudly at start() instead
  * of corrupting the lake on the first trigger. Seed partitions at
  * negative ids (DriftStream's batch_id=-1 baseline) are exempt: they are
  * re-derived idempotently at every (re)start, not owned by any batch.
  *
  * Sink-shape variants of the same hazard, same refusal discipline:
  *  - append sinks carrying a `batch_id` COLUMN ([[RetractStream]],
  *    [[VectorStream]]'s occupancy leg) never lose rows to an overwrite,
  *    but their read contract is "max batch_id per key wins" — restarted
  *    ids collide with old ones AND the fresh checkpoint resets the
  *    stateful counters, so old-world and new-world snapshots become
  *    indistinguishable in one dir ([[requireAppendSinkOwnership]]);
  *  - exactly-once parquet FILE sinks ([[VectorStream]]'s assign leg)
  *    keep a `_spark_metadata` log in the OUTPUT dir: a fresh checkpoint
  *    finds batch N already committed there and SILENTLY SKIPS writing it
  *    — data loss with no error ([[requireFileSinkOwnership]]).
  */
object StreamGuards {

  /** Max batch_id among `batch_id=` partitions under `storeDir`, or None
    * if the store doesn't exist / has none. Negative (seed) ids ignored. */
  private def maxStoreBatch(spark: SparkSession, storeDir: String): Option[Long] = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val ids = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .flatMap(s => scala.util.Try(
          s.getPath.getName.stripPrefix("batch_id=").toLong).toOption)
        .filter(_ >= 0L)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** Max batch id named by the checkpoint's offsets log, or None if the
    * checkpoint is fresh (no offsets yet). Offset file names are plain
    * batch numbers; compaction/temp artifacts are skipped. */
  private def maxOffsetBatch(spark: SparkSession, checkpointDir: String): Option[Long] = {
    val p = new Path(checkpointDir, "offsets")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val ids = fs.listStatus(p).toSeq
        .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** Refuse to start a stream whose durable store holds batch partitions
    * its checkpoint never logged. Call from start() BEFORE the stream is
    * created, once per durable store the stream owns. */
  def requireStoreOwnership(
      spark: SparkSession, checkpointDir: String, storeDir: String,
      what: String): Unit = {
    maxStoreBatch(spark, storeDir).foreach { mj =>
      val mo = maxOffsetBatch(spark, checkpointDir)
      require(mo.exists(_ >= mj),
        s"$what: $storeDir already holds batch_id=$mj but checkpoint " +
          s"$checkpointDir has ${mo.fold("no offsets (fresh checkpoint)")(o =>
            s"max logged batch $o")} — these partitions belong to a " +
          "DIFFERENT checkpoint. Starting would restart batch ids at " +
          (mo.fold(0L)(_ + 1)) + " and silently overwrite the existing " +
          "partitions, permanently losing their rows at the next " +
          "rebuild-from-journal. Restore the original checkpoint, or " +
          "explicitly move/delete the store to start fresh.")
    }
  }

  /** Append-sink variant: the sink stamps a `batch_id` COLUMN (no
    * partition dirs), so ownership is checked against max(batch_id) read
    * from the sink itself — a one-off column-pruned scan of one long
    * column at start(), not a per-trigger cost. An append sink never
    * loses rows to a clobber, but a fresh checkpoint restarts BOTH the
    * batch ids and the stream's stateful counters at zero, so new-world
    * snapshots land under ids the old world already used and the sink's
    * "max batch_id per key is current" read contract silently selects
    * across two unrelated state lineages. */
  def requireAppendSinkOwnership(
      spark: SparkSession, checkpointDir: String, sinkDir: String,
      what: String): Unit = {
    val p = new Path(sinkDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val mj = scala.util.Try(
        spark.read.parquet(sinkDir)
          .agg(org.apache.spark.sql.functions.max("batch_id")).head())
        .toOption.filterNot(_.isNullAt(0)).map(_.getLong(0))
      mj.foreach { m =>
        val mo = maxOffsetBatch(spark, checkpointDir)
        require(mo.exists(_ >= m),
          s"$what: $sinkDir already holds rows up to batch_id=$m but " +
            s"checkpoint $checkpointDir has ${mo.fold(
              "no offsets (fresh checkpoint)")(o => s"max logged batch $o")} " +
            "— those rows belong to a DIFFERENT checkpoint. Starting would " +
            "restart batch ids (and the stream's keyed state) at zero, so " +
            "new snapshots would collide with the old lineage's ids and " +
            "the max-batch_id-per-key read contract would silently mix the " +
            "two. Restore the original checkpoint, or explicitly " +
            "move/delete the sink to start fresh.")
      }
    }
  }

  /** Exactly-once parquet FILE-sink variant: the sink's `_spark_metadata`
    * commit log (inside the OUTPUT dir) is per-checkpoint state. On a
    * fresh checkpoint, batch N finds itself already committed in the old
    * log and the FileStreamSink SKIPS the write with only an info-level
    * log line — silent data loss, worse than the clobber case because
    * nothing is even overwritten. Ownership check: every batch the
    * metadata log has committed must be named by the checkpoint's offsets
    * log. Compacted log files (`N.compact`) count as batch N. */
  def requireFileSinkOwnership(
      spark: SparkSession, checkpointDir: String, sinkDir: String,
      what: String): Unit = {
    val p = new Path(sinkDir, "_spark_metadata")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val ids = fs.listStatus(p).toSeq.flatMap(s => scala.util.Try(
        s.getPath.getName.stripSuffix(".compact").toLong).toOption)
      if (ids.nonEmpty) {
        val mj = ids.max
        val mo = maxOffsetBatch(spark, checkpointDir)
        require(mo.exists(_ >= mj),
          s"$what: $sinkDir/_spark_metadata has committed batch $mj but " +
            s"checkpoint $checkpointDir has ${mo.fold(
              "no offsets (fresh checkpoint)")(o => s"max logged batch $o")} " +
            "— the sink's commit log belongs to a DIFFERENT checkpoint. " +
            "Starting would replay batch ids the log already holds and the " +
            "file sink would SILENTLY SKIP writing them (data loss with no " +
            "error). Restore the original checkpoint, or explicitly " +
            "move/delete the sink to start fresh.")
      }
    }
  }
}
