package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec
import graft.ops.Retract

/** Stream/batch equivalence for retractable aggregates: the
  * transformWithState histogram maintenance over a +1/−1 changelog stream
  * equals the batch `Retract.maintainHistogram` fold of the same
  * changelog — including across a checkpoint restart — and a corrupt
  * changelog (retracting a never-held row) fails the query loudly. */
class RetractStreamSpec extends SparkSpec {

  import spark.implicits._

  // transformWithState requires the RocksDB state store
  private val ProvKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val old = spark.conf.getOption(ProvKey)
    spark.conf.set(ProvKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally old match {
      case Some(v) => spark.conf.set(ProvKey, v)
      case None => spark.conf.unset(ProvKey)
    }
  }

  /** Deterministic changelog over 3 keys: inserts with values id%7,
    * retractions of the id%3==0 subset (including every current minimum of
    * key "a" — the non-invertible case), later re-inserts. */
  private def changelog(): Seq[Seq[(String, Long, Long)]] = Seq(
    // drop 0: base inserts
    (0L until 40L).map(i => (s"k${i % 3}", i % 7, 1L)),
    // drop 1: retract the i%3==0 slice of drop 0 (these values DO exist),
    // plus EVERY zero-valued row of k1 (i ∈ {7, 28, 35} — k1's entire
    // minimum value class, the non-invertible delete min/max cannot fold
    // without the histogram), plus fresh inserts shifting the domain up
    (0L until 40L).filter(_ % 3 == 0).map(i => (s"k${i % 3}", i % 7, -1L)) ++
      Seq(7L, 28L, 35L).map(i => (s"k${i % 3}", i % 7, -1L)) ++
      (40L until 60L).map(i => (s"k${i % 3}", i % 7 + 10, 1L)),
    // drop 2: retract some of drop 1's inserts, insert more
    (40L until 60L).filter(_ % 2 == 0).map(i => (s"k${i % 3}", i % 7 + 10, -1L)) ++
      (60L until 70L).map(i => (s"k${i % 3}", i % 7, 1L))
  )

  private def writeDrops(landing: String, drops: Seq[Seq[(String, Long, Long)]],
      seen: scala.collection.mutable.Set[String], t0: Long): Unit =
    drops.zipWithIndex.foreach { case (d, i) =>
      d.toDF("key", "v", "dcnt").coalesce(1).write.mode("append").json(landing)
      stampDrop(landing, seen, t0 + i * 60000L)
    }

  /** Latest snapshot per key from the streamed parquet (max batch_id),
    * tombstones (n = 0) dropped. */
  private def latest(outDir: String): Set[(String, Long, Long, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    spark.read.parquet(outDir)
      .withColumn("__rn", row_number().over(
        Window.partitionBy("key").orderBy(col("batch_id").desc)))
      .filter(col("__rn") === 1 && col("n") > 0)
      .select("key", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Long, Long, Long)].collect().toSet
  }

  /** Batch fold of the same changelog through the REAL batch operator:
    * drop 0 as the seed histogram, the rest as one compacted delta. */
  private def batchExpected(drops: Seq[Seq[(String, Long, Long)]])
      : Set[(String, Long, Long, Long, Long)] = {
    val hist0 = drops.head.toDF("key", "v", "dcnt")
      .groupBy("key", "v").agg(sum("dcnt").as("cnt"))
    val delta = drops.tail.flatten.toDF("key", "v", "dcnt")
      .groupBy("key", "v").agg(sum("dcnt").as("dcnt"))
    Retract.aggFromHistogram(
        Retract.maintainHistogram(hist0, delta, Seq("key")), Seq("key"))
      .select("key", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Long, Long, Long)].collect().toSet
  }

  test("streamed histogram maintenance equals the batch fold of the same changelog") { withRocksDb {
    val dir = Files.createTempDirectory("retractstream1").toString
    val drops = changelog()
    writeDrops(s"$dir/landing", drops,
      scala.collection.mutable.Set.empty[String],
      System.currentTimeMillis() - 600000L)
    val q = RetractStream.start(spark, s"$dir/landing", s"$dir/out", s"$dir/ckpt")
    q.awaitTermination()
    val streamed = latest(s"$dir/out")
    val expected = batchExpected(drops)
    assert(streamed.nonEmpty)
    assert(streamed == expected, s"streamed=$streamed expected=$expected")
    // the retractions really exercised min re-derivation: k1's entire
    // zero-value class was deleted, so its maintained min must sit ABOVE
    // the naive min over all inserts ever seen
    val naiveMin = drops.flatten.filter(_._3 > 0).groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(_._2).min }
    val k1Min = streamed.collectFirst { case ("k1", _, _, mn, _) => mn }.get
    assert(naiveMin("k1") == 0L && k1Min > 0L,
      s"min re-derivation not exercised: naive=${naiveMin("k1")} maintained=$k1Min")
  } }

  test("state survives a checkpoint restart: two runs equal one batch fold") { withRocksDb {
    val dir = Files.createTempDirectory("retractstream2").toString
    val drops = changelog()
    val seen = scala.collection.mutable.Set.empty[String]
    val t0 = System.currentTimeMillis() - 600000L
    // run 1: drop 0 only (seeds the histogram state)
    writeDrops(s"$dir/landing", drops.take(1), seen, t0)
    val q1 = RetractStream.start(spark, s"$dir/landing", s"$dir/out", s"$dir/ckpt")
    q1.awaitTermination()
    // run 2, same checkpoint: the retraction drops — they only fold
    // correctly if the run-1 histogram state was restored
    writeDrops(s"$dir/landing", drops.drop(1), seen, t0 + 120000L)
    val q2 = RetractStream.start(spark, s"$dir/landing", s"$dir/out", s"$dir/ckpt")
    q2.awaitTermination()
    assert(latest(s"$dir/out") == batchExpected(drops))
  } }

  test("a corrupt changelog (retracting a never-held row) fails the query loudly") { withRocksDb {
    val dir = Files.createTempDirectory("retractstream3").toString
    Seq(("kx", 5L, 1L), ("kx", 99L, -1L)) // v=99 was never inserted
      .toDF("key", "v", "dcnt").coalesce(1).write.mode("append").json(s"$dir/landing")
    val q = RetractStream.start(spark, s"$dir/landing", s"$dir/out", s"$dir/ckpt")
    val e = intercept[StreamingQueryException](q.awaitTermination())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("never held")),
      s"wrong failure: ${messages(e)}")
  } }
}
