package graft.llm

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle registry for the dedup/similarity tier's INTERNAL persisted
  * frames (`jaccardPairs`, `minhashNearDups`, `lshNearDups` each cache a
  * multi-consumer intermediate). A persist with no matching unpersist is an
  * unbounded-by-default leak in long-running services: CacheManager dedupes
  * identical plans, but every distinct input corpus adds a new entry that
  * lives until a global `clearCache()`.
  *
  * Operators register their internal frames here instead of calling
  * `persist()` directly; callers release them with [[release]] AFTER the
  * action that consumed the returned frame (the caches are lazy inputs of
  * the returned plan — releasing earlier would recompute the shared
  * intermediate once per consumer). This frees exactly the tier's own
  * caches, never the caller's.
  *
  * Scope contract: the registry is JVM-global, not session- or
  * thread-scoped — [[release]] drains EVERY tracked frame. Sequential
  * pipelines (the engine's Bench/Verify/RunOne loops, a driver running
  * one curation job at a time) get exact lifecycle management for free;
  * CONCURRENT pipelines sharing a JVM must coordinate (release only at a
  * boundary where no tracked pipeline is still consuming its plan, or
  * serialize the pipelines) — an interleaved release would unpersist a
  * sibling's in-flight intermediate, which recomputes (correctly but
  * once per consumer). */
object Caches {

  private val tracked = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[release]]. */
  private[llm] def persist(df: DataFrame): DataFrame = {
    tracked.add(df.persist())
    df
  }

  /** Unpersist every internal frame cached since the last release. Safe to
    * call any time after the consuming action; a no-op when nothing is
    * tracked. */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
  }

  /** Unpersist the RDD pinned by a `localCheckpoint()`ed frame.
    * `Dataset.unpersist` cannot reach it — the checkpoint's storage lives
    * on the RDD inside the frame's LogicalRDD leaf, not in the
    * CacheManager — so iterative/streaming code that checkpoints per
    * round/batch must release through this or the blocks accumulate
    * until the driver GCs the frame reference. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Harness variant ([[graft.Bench]]/[[graft.Verify]]/[[graft.RunOne]] call
    * this between queries): [[release]] plus removal of any remaining
    * persistent RDDs — e.g. the localCheckpoint storage that truncates
    * `dedupClusters`' iteration lineage, which belongs to the (already
    * consumed and discarded) result plan. Only for contexts that own the
    * whole session; a library caller with caches of their own should use
    * [[release]]. */
  def releaseAll(spark: SparkSession): Unit = {
    release()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
