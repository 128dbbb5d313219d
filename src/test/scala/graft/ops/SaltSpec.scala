package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Td}

class SaltSpec extends SparkSpec {

  import spark.implicits._

  test("skew-resistant distinctCount equals countDistinct (sf0.001 events)") {
    val e = Td.table(spark, Sf0001, "events")
    val salted = Salt.distinctCount(e, Seq("event_type"), "user_id")
      .as[(String, Long)].collect().toMap
    val direct = e.groupBy("event_type").agg(countDistinct("user_id"))
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  test("saltedSumCount equals direct groupBy sum/count, including hot keys") {
    // one key holds 90% of rows — the salted path spreads it over buckets
    val skewed = ((1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 7}", i.toDouble))).toDF("k", "v")
    val salted = Salt.saltedSumCount(skewed, Seq("k"), "v", buckets = 8)
      .select("k", "sum_value", "n").as[(String, Double, Long)].collect()
      .map { case (k, s, n) => k -> ((s, n)) }.toMap
    val direct = skewed.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map { case (k, s, n) => k -> ((s, n)) }.toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n, s"count mismatch for $k")
      assert(math.abs(salted(k)._1 - s) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("distinctCount keeps all-null-value groups with count 0, like count(DISTINCT)") {
    val df = Seq(
      ("a", Some(1)), ("a", Some(1)), ("a", None),
      ("b", None), ("b", None) // all-null group must appear with 0
    ).toDF("k", "v")
    val got = Salt.distinctCount(df, Seq("k"), "v")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 0L))
  }

  test("salt is replay-deterministic: pure function of row content, not position") {
    // The same logical rows, shuffled into different physical layouts, must
    // land in identical salt buckets — this is what makes the two-phase agg
    // safe under task retries / speculation (a recomputed partition routes
    // every row exactly as the original attempt did).
    val rows = (1 to 500).map(i => (s"k${i % 3}", i.toDouble))
    val a = rows.toDF("k", "v")
    val b = rows.reverse.toDF("k", "v").repartition(7)
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("__salt",
          pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(8)))
        .select("k", "v", "__salt").as[(String, Double, Long)]
        .collect().map { case (k, v, s) => (k, v) -> s }.toMap
    assert(buckets(a) == buckets(b))
  }

  test("disambiguator column spreads exact-duplicate hot rows across buckets") {
    // 9000 byte-identical rows of one hot key: content-only salt collapses
    // them into one bucket (documented caveat); a deterministic per-row id
    // passed as a disambiguator spreads them while staying replay-stable.
    val dup = (1 to 9000).map(i => ("hot", 1.0, i.toLong)).toDF("k", "v", "event_id")
    val spread = Salt.saltedAgg(dup.select("k", "v"), Seq("k"), buckets = 8,
      partial = Seq(count(lit(1)) -> "n"),
      combine = Seq(((n: String) => sum(col(n))) -> "n"))
    // content-only: all duplicates in one (key, salt) group => 1 phase-1 row
    assert(spread.select("n").as[Long].head() == 9000L)

    val withId = Salt.saltedSumCount(dup, Seq("k"), "v", buckets = 8,
      disambiguators = Seq(col("event_id")))
      .select("k", "sum_value", "n").as[(String, Double, Long)].head()
    assert(withId == (("hot", 9000.0, 9000L)))
    // and the phase-1 spread is real: distinct salts > 1 for the hot key
    val nSalts = dup
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v"), col("event_id"), col("event_id")), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts > 1)
  }

  test("saltedJoin equals the plain join row-for-row on 90%-hot data") {
    val fact = ((1 to 9000).map(i => (0L, i.toLong)) ++
      (1 to 1000).map(i => ((i % 50 + 1).toLong, i.toLong))).toDF("k", "v")
    val dim = (0L to 50L).map(k => (k, s"seg${k % 7}")).toDF("k", "seg")
    val salted = Salt.saltedJoin(fact, dim, "k", buckets = 8, hotThreshold = 500L)
      .select("k", "v", "seg").as[(Long, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val plain = fact.join(dim, "k")
      .select("k", "v", "seg").as[(Long, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain && plain.nonEmpty) // exact MULTISET equality
  }

  test("saltedJoin: dim rows replicate only for hot keys; unmatched keys drop like inner join") {
    val fact = ((1 to 2000).map(i => (0L, i.toLong)) ++
      Seq((1L, 1L), (2L, 2L), (99L, 3L))).toDF("k", "v") // 99 has no dim row
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (50L, "unref")).toDF("k", "seg")
    val got = Salt.saltedJoin(fact, dim, "k", buckets = 4, hotThreshold = 100L)
    assert(got.count() == 2000 + 2) // k=99 dropped, k=50 unreferenced
    // the hot key's fact rows really spread: more than one salt bucket
    val spread = fact.filter(col("k") === 0L)
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v")), lit(4L)))
      .select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("saltedJoin raises loudly when 'hot' keys exceed the driver cap") {
    val fact = (1 to 4000).map(i => ((i % 40).toLong, i.toLong)).toDF("k", "v")
    val dim = (0L to 40L).map(k => (k, k)).toDF("k", "d")
    val e = intercept[IllegalArgumentException] {
      Salt.saltedJoin(fact, dim, "k", buckets = 4,
        hotThreshold = 10L, maxHotKeys = 5)
    }
    assert(e.getMessage.contains("raise hotThreshold"))
  }
}
