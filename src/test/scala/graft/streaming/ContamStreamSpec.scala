package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.{Caches, Similarity}
import graft.sources.Fixtures

/** Streaming decontamination: per-trigger verdicts must equal the batch
  * probe over the union of drops (same index, same code objects), planted
  * twins must be caught in whichever trigger carries them, a restart must
  * process only new files, and null landing rows must not crash-loop. */
class ContamStreamSpec extends SparkSpec {

  import spark.implicits._

  private def base: DataFrame = graft.Td.table(spark, Sf0001, "embeddings")

  /** Train side: the full base corpus as double-array embeddings. */
  private def train: DataFrame = base
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding"))

  /** Eval twins of base vectors with `vec_id % 10 = 0` in [lo, hi): the
    * SimilaritySpec perturbation (first component +0.25 — cosine stays
    * >= 0.9 and the original remains the nearest neighbor). */
  private def twins(lo: Long, hi: Long): DataFrame = base
    .filter(col("vec_id") % 10 === 0 && col("vec_id") >= lo && col("vec_id") < hi)
    .select((col("vec_id") + 1000000L).as("vec_id"),
      concat(
        array(element_at(col("embedding"), 1).cast("double") + lit(0.25)),
        transform(slice(col("embedding"), 2, 63), x => x.cast("double"))
      ).as("embedding"))

  /** Land `df` as ONE parquet file (exact doubles — JSONL would not
    * round-trip them) with an explicit arrival stamp. */
  private def drop(landing: java.nio.file.Path, name: String, df: DataFrame,
      seen: scala.collection.mutable.Set[String], ts: Long): Unit = {
    val tmp = Fixtures.tempDir("contamdrop")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = new java.io.File(tmp.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, landing.resolve(name))
    stampDrop(landing.toString, seen, ts)
  }

  private def readOut(dir: java.nio.file.Path): Map[Long, (Long, Long, Double)] =
    spark.read.parquet(dir.resolve("out").toString)
      .select("eval_id", "n_hits", "top_train", "top_cos")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("stream verdicts equal the batch probe over the drop union; twins caught per trigger") {
    val dir = Fixtures.tempDir("contam1")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    val t1 = twins(0L, 250L)
    val t2 = twins(250L, 500L)
    drop(landing, "t1.parquet", t1, seen, 1000000L)
    drop(landing, "t2.parquet", t2, seen, 2000000L)
    try {
      val q = ContamStream.start(spark, landing.toString, train,
        dir.resolve("out").toString, dir.resolve("ckpt").toString,
        minCos = 0.9, kCells = 16, nprobe = 2)
      q.awaitTermination()
      val got = readOut(dir)
      // every planted twin from BOTH triggers is caught, original on top
      val planted = (t1.unionByName(t2)).select("vec_id").as[Long].collect().toSet
      planted.foreach { id =>
        assert(got.contains(id), s"missed eval twin $id")
        assert(got(id)._2 == id - 1000000L, s"top_train of $id = ${got(id)._2}")
        assert(got(id)._3 >= 0.9)
      }
      // stream output == the batch probe over the union (same code objects,
      // but the stream partitioned the evals across two triggers)
      val idx = Similarity.buildContamIndex(train, "vec_id", "embedding",
        kCells = 16, nprobe = 2)
      val batch = Similarity.contamRollup(Similarity.probeContamination(
          t1.unionByName(t2), "vec_id", "embedding", idx, 0.9))
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == batch)
      // two triggers -> two batch_id partitions, each carrying its own drop
      val parts = spark.read.parquet(dir.resolve("out").toString)
        .select("batch_id").distinct().as[Long].collect().toSet
      assert(parts == Set(0L, 1L))
    } finally Caches.releaseAll(spark)
  }

  test("restart processes only the new drop; null landing rows are dropped, not a crash loop") {
    val dir = Fixtures.tempDir("contam2")
    val landing = dir.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    val seen = scala.collection.mutable.Set.empty[String]
    drop(landing, "t1.parquet", twins(0L, 250L), seen, 1000000L)
    try {
      val q1 = ContamStream.start(spark, landing.toString, train,
        dir.resolve("out").toString, dir.resolve("ckpt").toString,
        minCos = 0.9, kCells = 16, nprobe = 2)
      q1.awaitTermination()
      val first = readOut(dir)
      assert(first.nonEmpty)
      // second drop carries one twin, one null-embedding row, one null id
      val valid = twins(250L, 260L)
      val junk = Seq((Some(8888888L), None: Option[Seq[Double]]),
        (None: Option[Long], Some(Seq.fill(64)(0.5)))).toDF("vec_id", "embedding")
      drop(landing, "t2.parquet", valid.select(
          col("vec_id").as("vec_id"), col("embedding")).unionByName(
          junk.select(col("vec_id").cast("long").as("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))),
        seen, 2000000L)
      val q2 = ContamStream.start(spark, landing.toString, train,
        dir.resolve("out").toString, dir.resolve("ckpt").toString,
        minCos = 0.9, kCells = 16, nprobe = 2)
      q2.awaitTermination()
      val all = readOut(dir)
      // old verdicts untouched, the new twin present, junk rows absent
      first.foreach { case (k, v) => assert(all(k) == v) }
      val newTwins = valid.select("vec_id").as[Long].collect().toSet
      newTwins.foreach(id => assert(all.contains(id), s"restart missed twin $id"))
      assert(!all.contains(8888888L))
      // each eval id appears in exactly ONE batch partition (no re-emission)
      val perPart = spark.read.parquet(dir.resolve("out").toString)
        .groupBy("eval_id").agg(countDistinct(col("batch_id")).as("n"))
        .as[(Long, Long)].collect()
      assert(perPart.forall(_._2 == 1L))
    } finally Caches.releaseAll(spark)
  }
}
