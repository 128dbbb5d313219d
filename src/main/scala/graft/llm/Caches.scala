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
  */
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
