package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.Dedup

/** One epoch-aware batched document: for each training epoch, which
  * fixed-capacity batch the doc joins within its (epoch, band, shard)
  * cell, and at which slot. */
final case class EpochBatchedDoc(
    doc_id: Long, epoch: Int, band: Int, shard: Long, batch_idx: Long, slot: Long)

/** Streaming twin of [[graft.llm.Sampling.epochBatches]] (lt47): documents
  * arrive continuously and every (epoch, band, shard) cell's running
  * position cursor persists in keyed state, so each new doc gets its
  * per-epoch (batch_idx, slot) INCREMENTALLY — the epoch-aware loader
  * manifest stays current as the corpus grows, without re-batching any
  * epoch's history. The epoch fan-out is an exploded literal array — the
  * streaming-safe spelling of the batch operator's broadcast epoch table
  * (pure projection, no join node for the planner to reject) — so one
  * arriving doc yields `epochs` state updates, each in its own bounded
  * cell.
  *
  * Ordering contract (the [[BatchingStream]] compromise): arrival order
  * across micro-batches, the epoch key's (hk, id) order within one —
  * equal to the batch operator on a single-drop replay; capacity
  * exactness holds in every case because capacity depends only on the
  * band.
  *
  * State is ONE Long per (epoch, band, shard) — bounded by
  * ~epochs × 64 × shards by construction, still the cheapest possible
  * state shape.
  *
  * Checkpoint-ownership exemption: this object is transform-only — it
  * owns no durable sink, so the foreign-checkpoint clobber hazard
  * ([[StreamGuards]]) is the CALLER's to guard at whatever sink it
  * attaches ([[BatchingStream.start]] is the guarded reference sink). */
object EpochBatchingStream {

  /** Assign per-epoch (band, shard, batch_idx, slot) to each arriving
    * (doc_id, n_tok), carrying each (epoch, band, shard) position cursor
    * in keyed state. Rows with n_tok < 1 are dropped, matching the batch
    * operator. */
  def batch(
      docs: Dataset[(Long, Long)], // (doc_id, n_tok)
      tokenBudget: Long, epochs: Int, shards: Int): Dataset[EpochBatchedDoc] = {
    require(tokenBudget >= 1, s"batch: tokenBudget must be >= 1, got $tokenBudget")
    require(epochs >= 1, s"batch: epochs must be >= 1, got $epochs")
    require(shards >= 1, s"batch: shards must be >= 1, got $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF("doc_id", "n_tok")
      .filter(col("n_tok") >= 1L)
      .withColumn("band", (length(bin(col("n_tok"))) - 1).cast("int"))
      .withColumn("epoch", explode(lit((0 until epochs).toArray)))
      .withColumn("hk", Dedup.md5Hash60(concat_ws(":",
        col("epoch").cast("string"), col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("hk"), lit(shards.toLong)))
      .select("doc_id", "epoch", "band", "shard", "hk")
      .as[(Long, Int, Int, Long, Long)]
      .groupByKey(r => (r._2, r._3, r._4))
      .flatMapGroupsWithState[Long, EpochBatchedDoc](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (Int, Int, Long), rows: Iterator[(Long, Int, Int, Long, Long)],
            state: GroupState[Long]) =>
          val (epoch, band, shard) = key
          val cap = math.max(tokenBudget / ((2L << band) - 1), 1L)
          var pos = state.getOption.getOrElse(0L)
          // within the micro-batch: the batch operator's (hk, id) order
          val out = rows.toSeq.sortBy(r => (r._5, r._1)).map { case (id, _, _, _, _) =>
            val p = pos
            pos += 1
            EpochBatchedDoc(id, epoch, band, shard, p / cap, p % cap)
          }
          state.update(pos)
          out.iterator
      }
  }
}
