package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Sampling, TextOps}

/** Stream/batch equivalence for incremental length-batching: single-drop
  * replay equals the batch operator exactly; multi-drop runs continue each
  * (band, shard) position cursor across micro-batches. */
class BatchingStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Budget = 256L
  private val Shards = 4

  private def h60(s: String): BigInt = BigInt(
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)

  private def docs() = graft.Td.table(spark, Sf0001, "documents")
    .select(col("doc_id"), col("lang"), col("source"), col("text"))

  test("single-drop streaming batch equals batch lengthBatches") {
    val dir = Files.createTempDirectory("batchstream").toString
    docs().coalesce(1).write.mode("append").json(s"$dir/landing")
    val q = BatchingStream.start(spark, s"$dir/landing", s"$dir/out",
      s"$dir/ckpt", tokenBudget = Budget, shards = Shards)
    q.awaitTermination()

    val streamed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "band", "shard", "batch_idx", "slot")
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    val batch = Sampling.lengthBatches(
      docs().withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("long")),
      "doc_id", "n_tok", tokenBudget = Budget, shards = Shards)
      .as[(Long, Int, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("multi-drop batching continues each (band, shard) cursor across micro-batches") {
    val dir = Files.createTempDirectory("batchstream3").toString
    val all = docs()
      .withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("long"))
      .select("doc_id", "lang", "source", "text", "n_tok")
      .as[(Long, String, String, String, Long)].collect()
    val drops = Seq(
      all.filter(_._1 % 3 == 0), all.filter(_._1 % 3 == 1), all.filter(_._1 % 3 == 2))
    val seen = scala.collection.mutable.Set.empty[String]
    val t0 = System.currentTimeMillis() - drops.length * 60000L
    drops.zipWithIndex.foreach { case (d, i) =>
      d.toSeq.map(r => (r._1, r._2, r._3, r._4))
        .toDF("doc_id", "lang", "source", "text")
        .coalesce(1).write.mode("append").json(s"$dir/landing")
      // explicit strictly-increasing mtimes: the file source orders drops
      // by timestamp, and coarse-granularity filesystems can't be trusted
      // to separate back-to-back writes
      stampDrop(s"$dir/landing", seen, t0 + i * 60000L)
    }
    val q = BatchingStream.start(spark, s"$dir/landing", s"$dir/out",
      s"$dir/ckpt", tokenBudget = Budget, shards = Shards)
    q.awaitTermination()

    val got = spark.read.parquet(s"$dir/out")
      .select("doc_id", "band", "shard", "batch_idx", "slot")
      .as[(Long, Int, Long, Long, Long)].collect().toSet

    // local reference: drops in arrival order, (hk, id) within a drop,
    // one running position cursor per (band, shard)
    def band(w: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(w)
    val nTok = all.map(r => r._1 -> r._5).toMap
    val cursor = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    val expected = drops.flatMap { d =>
      d.filter(r => nTok(r._1) >= 1).map { r =>
        val b = band(nTok(r._1))
        val s = (h60(r._1.toString) % Shards).toLong
        (r._1, b, s, h60(s"$b:$s:${r._1}"))
      }
        .sortBy { case (id, _, _, hk) => (hk, BigInt(id)) }
        .map { case (id, b, s, _) =>
          val cap = math.max(Budget / ((2L << b) - 1), 1L)
          val p = cursor((b, s))
          cursor((b, s)) = p + 1
          (id, b, s, p / cap, p % cap)
        }
    }.toSet
    assert(got == expected)
    // cursor totals: every (band, shard) advanced by exactly its doc count
    val totals = all.filter(r => r._5 >= 1)
      .groupBy(r => (band(nTok(r._1)), (h60(r._1.toString) % Shards).toLong))
      .map { case (k, rs) => k -> rs.length.toLong }
    assert(cursor.toMap == totals)
  }
}
