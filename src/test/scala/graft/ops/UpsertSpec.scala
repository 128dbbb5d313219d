package graft.ops

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec

/** §2.9 upsert semantics: last-write-wins by key, idempotence
  * (merge(merge(t,x),x) == merge(t,x)), and atomic read-merge-rewrite. */
class UpsertSpec extends SparkSpec {

  import spark.implicits._

  test("fresh rows win by key; non-conflicting rows of both sides survive") {
    val old = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val fresh = Seq((2, "B"), (4, "D")).toDF("k", "v")
    val got = Upsert.merge(old, fresh, Seq("k")).as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "B"), (3, "c"), (4, "D")))
  }

  test("idempotence: merging the same batch twice changes nothing") {
    val rnd = new Random(7)
    val old = Seq.fill(200)((rnd.nextInt(50), rnd.nextInt(1000))).distinctBy(_._1).toDF("k", "v")
    val fresh = Seq.fill(100)((rnd.nextInt(50), rnd.nextInt(1000))).distinctBy(_._1).toDF("k", "v")
    val once = Upsert.merge(old, fresh, Seq("k"))
    val twice = Upsert.merge(once, fresh, Seq("k"))
    assert(once.as[(Int, Int)].collect().toSet == twice.as[(Int, Int)].collect().toSet)
  }

  test("mergeInto creates then upserts a parquet table atomically") {
    val dir = Files.createTempDirectory("graft_upsert").toString + "/tbl"
    Upsert.mergeInto(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), dir, Seq("k"))
    Upsert.mergeInto(spark, Seq((2, "B"), (3, "C")).toDF("k", "v"), dir, Seq("k"))
    val got = spark.read.parquet(dir).as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (2, "B"), (3, "C")))
  }

  test("scd2: consecutive duplicates collapse, changes open new intervals") {
    val ev = Seq(
      (1L, 10L, Some("A"), 1L), (1L, 20L, Some("A"), 2L),
      (1L, 30L, Some("B"), 3L), (1L, 40L, Some("A"), 4L))
      .toDF("k", "ts", "v", "id")
    val got = Upsert.scd2(ev, "k", "ts", "v", "id")
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().sortBy(_._3).toSeq
    assert(got == Seq(
      (1L, Some("A"), 10L, Some(30L), false),
      (1L, Some("B"), 30L, Some(40L), false),
      (1L, Some("A"), 40L, None, true)))
  }

  test("scd2: an opening run of nulls is ONE interval (null-safe change detection)") {
    val ev = Seq(
      (1L, 10L, None: Option[String], 1L), (1L, 20L, None: Option[String], 2L),
      (1L, 30L, Some("C"), 3L))
      .toDF("k", "ts", "v", "id")
    val got = Upsert.scd2(ev, "k", "ts", "v", "id")
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().sortBy(_._3).toSeq
    assert(got == Seq(
      (1L, None, 10L, Some(30L), false),
      (1L, Some("C"), 30L, None, true)))
  }

  test("scd2: equal timestamps order by the tie column") {
    val ev = Seq(
      (1L, 10L, Some("A"), 2L), (1L, 10L, Some("B"), 1L))
      .toDF("k", "ts", "v", "id")
    val got = Upsert.scd2(ev, "k", "ts", "v", "id")
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._3, r._2)).toSeq
    // id 1 (B) precedes id 2 (A) at the same ts
    assert(got == Seq(
      (1L, Some("A"), 10L, None, true),
      (1L, Some("B"), 10L, Some(10L), false)))
  }
}
