package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

/** Streaming MinHash near-dup tagging: stream output must equal a local
  * replay of the same banding + first-seen bucket rule, planted twins must
  * be found across micro-batches, and bucket state must survive restarts. */
class NearDupStreamSpec extends SparkSpec {

  import spark.implicits._

  // seeded word-soup docs; twins differ in ONE trailing token of 20 so the
  // true shingle Jaccard (~0.85) clears the LSH band recall comfortably
  private val vocab = Array("scan", "merge", "sort", "hash", "join", "agg",
    "row", "col", "key", "batch", "span", "tree", "node", "leaf", "root",
    "page", "disk", "wire", "pool", "task", "plan", "cost", "stat", "mapp")
  private def soup(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to 20).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }
  private def twin(seed: Int): String = {
    val toks = soup(seed).split(" ")
    (toks.dropRight(1) :+ "changedtail").mkString(" ")
  }

  // ids 1-6 in trigger 1; 7-12 in trigger 2. 9 twins 3 (cross-batch),
  // 10 twins 7 (same batch), 11 copies 1 exactly (cross-batch), 12 unique.
  private val docs: Seq[(Long, String)] = Seq(
    1L -> soup(1), 2L -> soup(2), 3L -> soup(3), 4L -> soup(4),
    5L -> soup(5), 6L -> soup(6),
    7L -> soup(7), 8L -> soup(8), 9L -> twin(3), 10L -> twin(7),
    11L -> soup(1), 12L -> soup(12))

  /** Local replay of tagStream's bucket rule over batch-computed bands:
    * triggers processed in order, docs per trigger in id order, first
    * earliest-seen member with est >= minEstJ wins, membership capped. */
  private def localExpect(
      triggers: Seq[Seq[Long]], minEstJ: Double, cap: Int): Map[Long, Option[Long]] = {
    val df = docs.toDF("doc_id", "text")
    val bands = NearDupStream.withBands(df, shingleN = 3, numHashes = 32, rowsPerBand = 4)
      .select(col("doc_id").cast("long"), col("band"), col("band_hash"), col("sig"))
      .as[(Long, Int, Long, Seq[Long])].collect()
    val sigOf = bands.map(r => r._1 -> r._4).toMap
    val bucketsOf = bands.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSeq).toMap
    def est(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    val members = scala.collection.mutable.Map.empty[(Int, Long), Vector[Long]]
    val verdicts = scala.collection.mutable.Map.empty[Long, Option[Long]]
    for (trigger <- triggers; id <- trigger.sorted) {
      var best: Option[Long] = None
      for (bucket <- bucketsOf(id)) {
        val ms = members.getOrElse(bucket, Vector.empty)
        val hit = ms.find(m => est(sigOf(id), sigOf(m)) >= minEstJ)
        best = (best.toSeq ++ hit.toSeq).minOption
        members(bucket) = if (ms.length < cap) ms :+ id else ms
      }
      verdicts(id) = best
    }
    verdicts.toMap
  }

  private def runStream(dir: java.nio.file.Path, triggers: Seq[Seq[Long]],
      alreadyLanded: Int = 0): Map[Long, Option[Long]] = {
    val landing = dir.resolve("landing").toString
    val byId = docs.toMap
    triggers.zipWithIndex.drop(alreadyLanded).foreach { case (ids, i) =>
      val jsonl = ids.sorted.map { id =>
        s"""{"doc_id": $id, "lang": "en", "source": "s", "text": "${byId(id)}"}"""
      }.mkString("\n")
      Fixtures.write(dir.resolve("landing"), s"t$i.jsonl", jsonl)
    }
    val q = NearDupStream.start(spark, landing, dir.resolve("out").toString,
      dir.resolve("ckpt").toString)
    q.awaitTermination()
    spark.read.parquet(dir.resolve("out").toString)
      .select("doc_id", "dup_of")
      .as[(Long, Option[Long])].collect().toMap
  }

  test("stream verdicts equal the local banding replay; planted twins found cross-batch") {
    val dir = Fixtures.tempDir("neardup1")
    java.nio.file.Files.createDirectories(dir.resolve("landing"))
    val triggers = Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L), Seq(7L, 8L, 9L, 10L, 11L, 12L))
    val got = runStream(dir, triggers)
    val expected = localExpect(triggers, minEstJ = 0.5, cap = 64)
    assert(got == expected, s"got=$got expected=$expected")
    // the planted relationships must actually be detected, not just agreed on
    assert(got(9L).contains(3L), "cross-batch twin 9->3 missed")
    assert(got(10L).contains(7L), "same-batch twin 10->7 missed")
    assert(got(11L).contains(1L), "exact cross-batch copy 11->1 missed")
    assert(got(12L).isEmpty && got(1L).isEmpty && got(7L).isEmpty)
  }

  test("a null-text landing record is dropped, not a permanent crash loop") {
    val dir = Fixtures.tempDir("neardup3")
    java.nio.file.Files.createDirectories(dir.resolve("landing"))
    // valid JSON, missing "text" — the permissive schema parses it to a
    // null-text row; the stream must drop it and process the rest
    Fixtures.write(dir.resolve("landing"), "t0.jsonl",
      s"""{"doc_id": 1, "lang": "en", "source": "s", "text": "${soup(1)}"}
         |{"doc_id": 99}
         |{"doc_id": 11, "lang": "en", "source": "s", "text": "${soup(1)}"}""".stripMargin)
    val q = NearDupStream.start(spark, dir.resolve("landing").toString,
      dir.resolve("out").toString, dir.resolve("ckpt").toString)
    q.awaitTermination()
    val got = spark.read.parquet(dir.resolve("out").toString)
      .select("doc_id", "dup_of")
      .as[(Long, Option[Long])].collect().toMap
    assert(got.keySet == Set(1L, 11L), s"null-text record must vanish: $got")
    assert(got(11L).contains(1L))
  }

  test("bucket state survives a restart: a later file still tags against old members") {
    val dir = Fixtures.tempDir("neardup2")
    java.nio.file.Files.createDirectories(dir.resolve("landing"))
    val t1 = Seq(Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val r1 = runStream(dir, t1)
    assert(r1.values.forall(_.isEmpty))
    // second run, SAME checkpoint: only the new file is processed, and 9
    // must still resolve against 3 (whose signature lives in bucket state)
    val both = t1 :+ Seq(9L, 12L)
    val r2 = runStream(dir, both, alreadyLanded = 1)
    assert(r2(9L).contains(3L), s"restart lost bucket state: $r2")
    assert(r2(12L).isEmpty)
    assert(r2(1L).isEmpty, "old docs must not be re-emitted after restart")
  }
}
