package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Sampling, TextOps}

/** Stream/batch equivalence for sequence packing: a single-drop replay
  * equals the batch operator exactly; multi-drop runs continue each
  * shard's token cursor across micro-batches (arrival order across drops,
  * (keepHash, id) order within a drop). */
class PackingStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Ctx = 100L
  private val Shards = 4

  private def h60(s: String): BigInt = BigInt(
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15), 16)

  private def docs() = graft.Td.table(spark, Sf0001, "documents")
    .select(col("doc_id"), col("lang"), col("source"), col("text"))

  test("single-drop streaming pack equals batch sequencePack") {
    val dir = Files.createTempDirectory("packstream").toString
    docs().coalesce(1).write.mode("append").json(s"$dir/landing")
    val q = PackingStream.start(spark, s"$dir/landing", s"$dir/out",
      s"$dir/ckpt", ctxTokens = Ctx, shards = Shards)
    q.awaitTermination()

    val streamed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "shard", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Sampling.sequencePack(
      docs().withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("long")),
      "doc_id", "n_tok", ctxTokens = Ctx, shards = Shards)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("multi-drop pack continues each shard's cursor across micro-batches") {
    val dir = Files.createTempDirectory("packstream3").toString
    val all = docs().withColumn("n_tok", size(TextOps.tokens(col("text"))).cast("long"))
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
      // explicit strictly-increasing mtimes (no sleep): the file source
      // orders drops by timestamp
      stampDrop(s"$dir/landing", seen, t0 + i * 60000L)
    }
    val q = PackingStream.start(spark, s"$dir/landing", s"$dir/out",
      s"$dir/ckpt", ctxTokens = Ctx, shards = Shards)
    q.awaitTermination()

    val got = spark.read.parquet(s"$dir/out")
      .select("doc_id", "shard", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().toSet

    // local reference: drops in arrival order, (keepHash, id) within a drop,
    // one running token cursor per shard across all drops
    val nTok = all.map(r => r._1 -> r._5).toMap
    val cursor = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val expected = drops.flatMap { d =>
      d.map(r => (r._1, (h60(r._1.toString) % Shards).toLong))
        .sortBy { case (id, shard) => (h60(s"$shard:$id") % 1000, BigInt(id)) }
        .map { case (id, shard) =>
          val start = cursor(shard)
          cursor(shard) = start + nTok(id)
          (id, shard, start / Ctx, start % Ctx)
        }
    }.toSet
    assert(got == expected)
    // every shard's final cursor equals its total token mass
    val totals = all.groupBy(r => (h60(r._1.toString) % Shards).toLong)
      .map { case (s, rs) => s -> rs.map(_._5).sum }
    assert(cursor.toMap == totals)
  }
}
