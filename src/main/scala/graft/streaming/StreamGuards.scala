package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Start-time ownership guards shared by the streams that keep a DURABLE
  * batch_id-partitioned store (journal / ledger / summary log) and read it
  * back as the source of truth ([[GraphStream]]'s edge journal,
  * [[ContaminationStream]]'s id ledger, [[DriftStream]]'s summary log,
  * [[FlowStream]]'s delta journal).
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
}
