package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Curation, TextOps}

/** CHAIN-LEVEL stream/batch equivalence: the whole lt31 scorecard + ld1
  * exact dedup + lt14 sequence packing pipeline run incrementally
  * (landing drops → curate stage → pack stage, each with persistent
  * checkpointed state) equals the batch chain on the same data.
  *
  * StreamingSpec/NearDupStreamSpec/PackingStreamSpec pin the PIECES;
  * this spec pins the COMPOSITION — state handoff between stages,
  * checkpoint resume across rounds, and the curated-tier seam. */
class ChainStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Ctx = 100L
  private val Shards = 4

  private def h60(s: String): BigInt = BigInt(
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)

  private def docs() = graft.Td.table(spark, Sf0001, "documents")
    .select(col("doc_id"), col("lang"), col("source"), col("text"))
    .as[(Long, String, String, String)]

  test("single-drop chain replay equals the batch chain exactly") {
    val dir = Files.createTempDirectory("chain1").toString
    docs().toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.mode("append").json(s"$dir/landing")
    ChainStream.runChainRound(spark, s"$dir/landing", s"$dir/work", Ctx, Shards)

    val streamed = spark.read.parquet(s"$dir/work/packed")
      .select("doc_id", "shard", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = ChainStream.batchChain(docs(), Ctx, Shards).collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // the curated tier itself also matches the batch survivors
    val curatedIds = spark.read.parquet(s"$dir/work/curated")
      .select("doc_id").as[Long].collect().toSet
    assert(curatedIds == batch.map(_._1))
  }

  test("multi-drop incremental chain: dedup equals batch, packing follows the cursor model") {
    val dir = Files.createTempDirectory("chain3").toString
    val all = docs().collect().sortBy(_._1)
    // three id-RANGE drops (ascending) — the regime where streaming
    // first-seen dedup provably equals the batch min-id survivor rule
    val bounds = Seq(all.length / 3, 2 * all.length / 3)
    val drops = Seq(
      all.slice(0, bounds(0)), all.slice(bounds(0), bounds(1)),
      all.slice(bounds(1), all.length))

    val seen = scala.collection.mutable.Set.empty[String]
    val t0 = System.currentTimeMillis() - drops.length * 60000L
    drops.zipWithIndex.foreach { case (d, i) =>
      d.toSeq.toDF("doc_id", "lang", "source", "text")
        .coalesce(1).write.mode("append").json(s"$dir/landing")
      // explicit strictly-increasing mtimes (no sleep): the file source
      // orders drops by timestamp and coarse-mtime filesystems can merge
      // back-to-back writes into one tick
      stampDrop(s"$dir/landing", seen, t0 + i * 60000L)
      // one incremental chain round per drop: both stages drain the new
      // data against their persistent checkpoints
      ChainStream.runChainRound(spark, s"$dir/landing", s"$dir/work", Ctx, Shards)
    }

    // ── dedup/scorecard tier: stream == batch survivor set ──
    val curated = spark.read.parquet(s"$dir/work/curated")
      .select("doc_id", "n_tok").as[(Long, Long)].collect()
    val batchSurvivors = ChainStream.batchChain(docs(), Ctx, Shards)
      .collect().map(_._1).toSet
    assert(curated.map(_._1).toSet == batchSurvivors)

    // ── packing tier: per-shard cursor model over the rounds' arrival
    //    order ((keepHash, id) inside a round, rounds in drop order) ──
    val nTok = curated.toMap
    val survivorSet = curated.map(_._1).toSet
    val cursor = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val expected = drops.flatMap { d =>
      d.map(_._1).filter(survivorSet)
        .map(id => (id, (h60(id.toString) % Shards).toLong))
        .sortBy { case (id, shard) => (h60(s"$shard:$id") % 1000, BigInt(id)) }
        .map { case (id, shard) =>
          val start = cursor(shard)
          cursor(shard) = start + nTok(id)
          (id, shard, start / Ctx, start % Ctx)
        }
    }.toSet
    val packed = spark.read.parquet(s"$dir/work/packed")
      .select("doc_id", "shard", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(packed == expected)

    // chain-level conservation: every shard's final cursor is its
    // survivors' total token mass (no doc lost or double-packed between
    // the stages' checkpoints)
    val totals = curated.groupBy { case (id, _) => (h60(id.toString) % Shards).toLong }
      .map { case (s, rs) => s -> rs.map(_._2).sum }
    assert(cursor.toMap == totals)
  }

  test("single-drop batching-gold chain equals the batch batching chain exactly") {
    val Budget = 256L
    val dir = Files.createTempDirectory("chainb1").toString
    docs().toDF("doc_id", "lang", "source", "text")
      .coalesce(1).write.mode("append").json(s"$dir/landing")
    ChainStream.runBatchedChainRound(spark, s"$dir/landing", s"$dir/work", Budget, Shards)

    val streamed = spark.read.parquet(s"$dir/work/batched")
      .select("doc_id", "band", "shard", "batch_idx", "slot")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val batch = ChainStream.batchChainBatched(docs(), Budget, Shards).collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("multi-drop batching-gold chain: dedup equals batch, batching follows the cursor model") {
    val Budget = 256L
    val dir = Files.createTempDirectory("chainb3").toString
    val all = docs().collect().sortBy(_._1)
    val bounds = Seq(all.length / 3, 2 * all.length / 3)
    val drops = Seq(
      all.slice(0, bounds(0)), all.slice(bounds(0), bounds(1)),
      all.slice(bounds(1), all.length))

    val seen = scala.collection.mutable.Set.empty[String]
    val t0 = System.currentTimeMillis() - drops.length * 60000L
    drops.zipWithIndex.foreach { case (d, i) =>
      d.toSeq.toDF("doc_id", "lang", "source", "text")
        .coalesce(1).write.mode("append").json(s"$dir/landing")
      stampDrop(s"$dir/landing", seen, t0 + i * 60000L)
      ChainStream.runBatchedChainRound(spark, s"$dir/landing", s"$dir/work", Budget, Shards)
    }

    // dedup tier: stream == batch survivor set (shared with the packing
    // chain — same stage 1)
    val curated = spark.read.parquet(s"$dir/work/curated")
      .select("doc_id", "n_tok").as[(Long, Long)].collect()
    val batchIds = ChainStream.batchChainBatched(docs(), Budget, Shards)
      .collect().map(_._1).toSet
    assert(curated.map(_._1).toSet == batchIds)

    // batching tier: one position cursor per (band, shard), advanced in
    // drop order, (hk, id) order within a drop — BatchingStream's model
    // applied to the chain's survivors
    val nTok = curated.toMap
    val survivorSet = curated.map(_._1).toSet
    def band(w: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(w)
    val cursor = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    val expected = drops.flatMap { d =>
      d.map(_._1).filter(id => survivorSet(id) && nTok(id) >= 1)
        .map { id =>
          val b = band(nTok(id))
          val s = (h60(id.toString) % Shards).toLong
          (id, b, s, h60(s"$b:$s:$id"))
        }
        .sortBy { case (id, _, _, hk) => (hk, BigInt(id)) }
        .map { case (id, b, s, _) =>
          val cap = math.max(Budget / ((2L << b) - 1), 1L)
          val p = cursor((b, s))
          cursor((b, s)) = p + 1
          (id, b, s, p / cap, p % cap)
        }
    }.toSet
    val got = spark.read.parquet(s"$dir/work/batched")
      .select("doc_id", "band", "shard", "batch_idx", "slot")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(got.toSet == expected)

    // chain-level conservation: every batchable survivor holds exactly
    // one slot across all rounds, and each (band, shard) cursor equals
    // its survivor count (nothing lost or double-batched at the seam)
    assert(got.length == got.map(_._1).distinct.length)
    assert(got.map(_._1).toSet == curated.filter(_._2 >= 1).map(_._1).toSet)
    val cellCounts = curated.filter(_._2 >= 1)
      .groupBy { case (id, w) => (band(w), (h60(id.toString) % Shards).toLong) }
      .map { case (k, rs) => k -> rs.length.toLong }
    assert(cursor.toMap == cellCounts)
  }

  test("scorecard verdict in the stream is the shared batch code (spot equality)") {
    // guard against the chain quietly diverging from lt31: the curated
    // tier must contain exactly the keep=true, min-id-per-hash docs
    val df = docs().toDF("doc_id", "lang", "source", "text")
    val keep = Curation.scorecard(df).where(col("keep")).select("doc_id").as[Long].collect().toSet
    val kept = df.filter(col("doc_id").isInCollection(keep))
    val minIds = kept.withColumn("h", md5(col("text")))
      .groupBy("h").agg(min("doc_id").as("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    val batch = ChainStream.batchChain(docs(), Ctx, Shards).collect().map(_._1).toSet
    assert(batch == minIds && minIds.nonEmpty && minIds.subsetOf(keep))
    // n_tok the chain carries matches the tokenizer
    val n1 = kept.select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    val curatedModel = ChainStream.curate(docs()).collect()
    curatedModel.foreach(c => assert(n1(c.doc_id) == c.n_tok))
  }
}
