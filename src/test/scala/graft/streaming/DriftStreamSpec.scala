package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Drift
import graft.sources.Fixtures

/** Streaming drift audits: after every run the sink must hold EXACTLY the
  * batch verdict over (frozen baseline vs union of all drops so far) — the
  * same rollup code objects over the same additive summaries — a restart
  * must fold in only the new drop while preserving that contract, and
  * permissive null landing rows must be dropped, not crash-looped. */
class DriftStreamSpec extends SparkSpec {

  import spark.implicits._

  // fixture split: even doc_ids/vec_ids are the frozen baseline, odd ones
  // arrive as drops — so the batch twin is the registered lt52/ls18 shape
  // (side = id % 2) over the rows the stream has seen
  private def docs: DataFrame = graft.Td.table(spark, Sf0001, "documents")
  private def docBaseline: DataFrame =
    docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
  private def docDrop(lo: Long, hi: Long): DataFrame =
    docs.filter(col("doc_id") % 2 === 1 &&
        col("doc_id") >= lo && col("doc_id") < hi)
      .select("doc_id", "text")

  private def vecs: DataFrame = graft.Td.table(spark, Sf0001, "embeddings")
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))
  private def vecBaseline: DataFrame = vecs.filter(col("vec_id") % 2 === 0)
  private def vecDrop(lo: Long, hi: Long): DataFrame =
    vecs.filter(col("vec_id") % 2 === 1 &&
      col("vec_id") >= lo && col("vec_id") < hi)

  private def drop(landing: java.nio.file.Path, name: String, df: DataFrame,
      seen: scala.collection.mutable.Set[String], ts: Long): Unit = {
    val tmp = Fixtures.tempDir("driftdrop")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, landing.resolve(name))
    stampDrop(landing.toString, seen, ts)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("token drift: sink equals the batch verdict after each drop, including across a restart") {
    val dir = Fixtures.tempDir("drift_tok")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    def args = (spark, landing.toString, docBaseline,
      dir.resolve("counts").toString, dir.resolve("out").toString,
      dir.resolve("ckpt").toString)

    // first drop carries a junk null-text row: dropped, never a crash loop
    val junk = Seq((Some(999999L), None: Option[String]))
      .toDF("doc_id", "text")
      .select(col("doc_id").cast("long"), col("text").cast("string"))
    drop(landing, "d1.parquet",
      docDrop(0, 200).unionByName(junk), seen, 1000000L)
    DriftStream.startTokenDrift(args._1, args._2, args._3, args._4,
      args._5, args._6, topK = 30).awaitTermination()
    val afterOne = sortedRows(spark.read.parquet(args._5))
    val batchOne = sortedRows(Drift.tokenDrift(
      docBaseline.unionByName(docDrop(0, 200)), "text", col("doc_id") % 2, 30))
    assert(afterOne == batchOne && afterOne.size == 30)

    // restart with a second drop: only the new file processes, and the
    // verdict is the rollup over BOTH drops plus the baseline
    drop(landing, "d2.parquet", docDrop(200, 500), seen, 2000000L)
    DriftStream.startTokenDrift(args._1, args._2, args._3, args._4,
      args._5, args._6, topK = 30).awaitTermination()
    val afterTwo = sortedRows(spark.read.parquet(args._5))
    val batchTwo = sortedRows(Drift.tokenDrift(
      docs.select("doc_id", "text"), "text", col("doc_id") % 2, 30))
    assert(afterTwo == batchTwo)

    // the summary ledger carries the baseline partition plus one partition
    // per trigger — the idempotence unit a replayed trigger overwrites
    val parts = spark.read.parquet(args._4)
      .select("batch_id").distinct().as[Long].collect().toSet
    assert(parts == Set(-1L, 0L, 1L), s"unexpected ledger partitions $parts")
  }

  test("embedding drift: sink equals the batch verdict over the drop union") {
    val dir = Fixtures.tempDir("drift_emb")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    drop(landing, "v1.parquet", vecDrop(0, 250), seen, 1000000L)
    drop(landing, "v2.parquet", vecDrop(250, 500), seen, 2000000L)
    DriftStream.startEmbeddingDrift(spark, landing.toString, vecBaseline,
      dir.resolve("counts").toString, dir.resolve("out").toString,
      dir.resolve("ckpt").toString, topK = 16).awaitTermination()
    val got = sortedRows(spark.read.parquet(dir.resolve("out").toString))
    val batch = sortedRows(Drift.embeddingDrift(
      vecs, "embedding", col("vec_id") % 2, 16))
    assert(got == batch && got.size == 16)
  }
}
