package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Sampling, TextOps}

/** Stream/batch equivalence for the incremental epoch-aware batcher:
  * single-drop replay equals batch [[Sampling.epochBatches]] exactly;
  * multi-drop runs continue every (epoch, band, shard) cursor across
  * micro-batches. The single-drop test batch-executes the transform
  * (Spark runs flatMapGroupsWithState over a batch Dataset with empty
  * state per group); the multi-drop test drives the real file-stream
  * harness, one AvailableNow drain per drop against a persistent
  * checkpoint, and checks it against the local cursor model. */
class EpochBatchingStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Budget = 256L
  private val Epochs = 2
  private val Shards = 4

  private def h60(s: String): BigInt = BigInt(
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)

  private def weighted() = graft.Td.table(spark, Sf0001, "documents")
    .select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
    .as[(Long, Long)]

  test("single-drop streaming epoch batch equals batch epochBatches") {
    val got = EpochBatchingStream.batch(weighted(), Budget, Epochs, Shards)
      .collect().map(b => (b.doc_id, b.epoch, b.band, b.shard, b.batch_idx, b.slot))
      .toSet
    val want = Sampling.epochBatches(
        weighted().toDF("doc_id", "n_tok"), "doc_id", "n_tok",
        Budget, Epochs, Shards)
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("multi-drop epoch batching continues each (epoch, band, shard) cursor") {
    val all = weighted().collect()
    val drops = Seq(
      all.filter(_._1 % 3 == 0), all.filter(_._1 % 3 == 1), all.filter(_._1 % 3 == 2))

    // streamed result: run the stateful transform drop by drop, carrying
    // cursors forward via the local reference model the state encodes
    def band(w: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(w)
    val nTok = all.toMap
    val cursor = scala.collection.mutable.Map.empty[(Int, Int, Long), Long]
      .withDefaultValue(0L)
    val expected = drops.flatMap { d =>
      (0 until Epochs).flatMap { e =>
        d.filter(r => nTok(r._1) >= 1).map { case (id, w) =>
          val hk = h60(s"$e:$id")
          (id, e, band(w), (hk % Shards).toLong, hk)
        }
      }
        .groupBy { case (_, e, b, s, _) => (e, b, s) }
        .toSeq
        .flatMap { case ((e, b, s), rows) =>
          rows.sortBy { case (id, _, _, _, hk) => (hk, BigInt(id)) }.map {
            case (id, _, _, _, _) =>
              val cap = math.max(Budget / ((2L << b) - 1), 1L)
              val p = cursor((e, b, s))
              cursor((e, b, s)) = p + 1
              (id, e, b, s, p / cap, p % cap)
          }
        }
    }.toSet

    // replay the same drops through the real transform with real
    // persistent state: a file-stream landing dir, one AvailableNow drain
    // per drop (the BatchingStream harness pattern)
    val dir = java.nio.file.Files.createTempDirectory("epochbatch3").toString
    val seen = scala.collection.mutable.Set.empty[String]
    val t0 = System.currentTimeMillis() - drops.length * 60000L
    drops.zipWithIndex.foreach { case (d, i) =>
      d.toSeq.toDF("doc_id", "n_tok")
        .coalesce(1).write.mode("append").json(s"$dir/landing")
      stampDrop(s"$dir/landing", seen, t0 + i * 60000L)
      val stream = spark.readStream
        .schema("doc_id LONG, n_tok LONG")
        .option("maxFilesPerTrigger", 1)
        .json(s"$dir/landing")
        .as[(Long, Long)]
      val q = EpochBatchingStream.batch(stream, Budget, Epochs, Shards)
        .writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[EpochBatchedDoc], batchId: Long) =>
            // idempotent per-batch_id partition sink, the BatchingStream
            // contract (a parquet sink would reject Update mode)
            b.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(s"$dir/out")
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val got = spark.read.parquet(s"$dir/out")
      .select("doc_id", "epoch", "band", "shard", "batch_idx", "slot")
      .as[(Long, Int, Int, Long, Long, Long)].collect()
    assert(got.toSet == expected)
    // every (doc, epoch) pair appears exactly once across all drops
    assert(got.length == got.map(r => (r._1, r._2)).distinct.length)
  }
}
