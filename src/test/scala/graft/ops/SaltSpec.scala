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
}
