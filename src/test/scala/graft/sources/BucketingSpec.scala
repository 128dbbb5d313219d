package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-tier layout check: two tables bucketed on the join key join with
  * ZERO shuffle exchanges — the co-located-join strategy SURVEY §2's scale
  * notes call for on repeated large⋈large joins (bucket once at write time,
  * every subsequent join on that key is exchange-free).
  */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val wh = Files.createTempDirectory("graft_bucketing").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$wh'")
    try {
      val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
      val dims = (0L until 50L).map(k => (k, s"name_$k")).toDF("k", "name")
      facts.write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_bkt.facts_b")
      dims.write.mode("overwrite")
        .bucketBy(8, "k").sortBy("k")
        .saveAsTable("graft_bkt.dims_b")

      val joined = spark.table("graft_bkt.facts_b")
        .hint("merge") // force SMJ so the broadcast path can't hide a shuffle
        .join(spark.table("graft_bkt.dims_b"), Seq("k"))
        .groupBy("name").agg(sum("v").as("total"))

      joined.collect() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val joinShuffles = plan.collect { case s: ShuffleExchangeExec => s }
      // one shuffle is expected for the final groupBy("name"); the join
      // itself must not add any (both sides read pre-bucketed on k)
      assert(joinShuffles.size <= 1,
        s"expected bucketed join to be exchange-free, plan:\n$plan")
      assert(joined.collect().length == 50)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    }
  }
}
