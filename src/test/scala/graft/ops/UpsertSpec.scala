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
}
