package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.sources.{Fixtures, Gbfs, Store}

/** Stream/batch equivalence (SURVEY.md §5.6): replaying snapshot files
  * through the Structured Streaming ingest yields exactly the table the
  * batch writer produces from the same snapshots. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def snapshots(dir: java.nio.file.Path) = Seq(
    (Fixtures.stationStatus(5, 3, 0), "2025-09-04 10:10:00"),
    (Fixtures.stationStatus(7, 2, 1), "2025-09-04 11:10:00"),
    (Fixtures.stationStatus(6, 4, 2), "2025-09-04 12:10:00")
  ).zipWithIndex.map { case ((payload, ts), i) =>
    Gbfs.statusFromJson(spark,
      Fixtures.write(dir, s"snap$i.json", payload), Timestamp.valueOf(ts))
  }

  test("streamed ingest of 3 snapshot drops equals batch ingest of the same files") {
    val dir = Fixtures.tempDir("stream")
    val snaps = snapshots(dir)

    val batchStore = new Store(spark, dir.toString + "/batch")
    snaps.foreach(batchStore.appendStatus)

    // landing dir: each snapshot as a JSON drop in the station_status schema
    val landing = dir.resolve("landing").toString
    snaps.foreach(_.coalesce(1).write.mode("append").json(landing))
    val streamStore = new Store(spark, dir.toString + "/stream")
    val q = StatusStream.start(spark, landing, streamStore,
      dir.resolve("ckpt").toString)
    q.awaitTermination()

    val key = Seq("station_id", "scraped_at", "num_bikes_available")
    val b = batchStore.status.select(key.head, key.tail: _*)
      .as[(String, Timestamp, Int)].collect().sorted
    val s = streamStore.status.select(key.head, key.tail: _*)
      .as[(String, Timestamp, Int)].collect().sorted
    assert(s.sameElements(b) && s.length == 9)
  }

  test("stateful stream deltas equal batch lag-diff on the same snapshots") {
    val dir = Fixtures.tempDir("stream3")
    val snaps = snapshots(dir)
    val landing = dir.resolve("landing").toString
    snaps.foreach(_.coalesce(1).write.mode("append").json(landing))

    val out = dir.resolve("deltas").toString
    val q = DeltaStream.start(spark, landing, out, dir.resolve("ckpt3").toString)
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .select("station_id", "scraped_at", "delta")
      .as[(String, Timestamp, Int)].collect().sorted

    val batchAll = snaps.reduce(_ unionByName _)
    val batch = graft.ops.TimeOps.lagDiff(batchAll,
        Seq("station_id"), Seq(org.apache.spark.sql.functions.col("scraped_at")),
        "num_bikes_available")
      .selectExpr("station_id", "scraped_at", "CAST(delta AS INT) AS delta")
      .as[(String, Timestamp, Int)].collect().sorted

    assert(streamed.sameElements(batch) && streamed.length == 9)
    // first observation per station must be delta 0 (quirk Q3)
    val firsts = streamed.groupBy(_._1).values.map(_.minBy(_._2.getTime))
    assert(firsts.forall(_._3 == 0))
  }

  test("watermark dedup drops duplicate (station, scraped_at) rows in-stream") {
    val dir = Fixtures.tempDir("stream2")
    val snaps = snapshots(dir)
    val landing = dir.resolve("landing").toString
    // drop the same snapshot twice -> raw stream sees 12 rows, dedup -> 9
    (snaps :+ snaps.head).foreach(_.coalesce(1).write.mode("append").json(landing))
    val store = new Store(spark, dir.toString + "/dedup")
    val q = StatusStream.start(spark, landing, store,
      dir.resolve("ckpt").toString, dedupWithinWatermark = true)
    q.awaitTermination()
    assert(store.status.count() == 9)
  }
}
