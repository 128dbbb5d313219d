package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Fixtures

/** The two runtime re-plan mechanisms a 100 TB join leans on, demonstrated
  * end-to-end rather than assumed: Catalyst's automatic Bloom runtime
  * filter (a selective dim predicate prunes the fact SHUFFLE before it
  * happens) and AQE's skew-join split (a hot key stops serializing one
  * task). Both run against thresholds lowered to test scale; the configs
  * under test are restored afterwards. */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim predicate injects a Bloom runtime filter into the fact scan side") {
    val dir = Fixtures.tempDir("rtf")
    // fact: 100k rows over 1000 keys; dim: 1000 rows, predicate keeps 10.
    // Parquet relations (not in-memory) so the injection rule sees scans.
    spark.range(100000)
      .select((col("id") % 1000).as("k"), col("id").as("payload"))
      .write.mode("overwrite").parquet(s"$dir/fact")
    spark.range(1000)
      .select(col("id").as("dk"), (col("id") % 100).as("cat"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") < 1) // selective
      val joined = fact.join(dim, col("k") === col("dk"))
      val n = joined.count()
      assert(n == 1000L) // 10 surviving dim keys x 100 fact rows each
      // InjectRuntimeFilter rewrites the fact side to
      //   Filter might_contain(<bloom_filter_agg subquery over dim>, xxhash64(k))
      // — the dim's Bloom sketch prunes fact rows BEFORE the join shuffle.
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"expected an injected Bloom runtime filter in:\n$optimized")
    }
  }

  test("Observation rides quality metrics on the action's own pass — no second scan") {
    // the 100 TB data-quality pattern: counters (rows, nulls, sums) attach
    // to the write pass itself instead of a separate aggregate job over
    // the same input.
    val obs = new org.apache.spark.sql.Observation("qc")
    val df = spark.range(10000)
      .select(col("id"), when(col("id") % 100 === 0, lit(null)).otherwise(col("id")).as("v"))
      .observe(obs, count(lit(1)).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"))
    df.write.mode("overwrite").format("noop").save()
    assert(obs.get("n") == 10000L)
    assert(obs.get("n_null") == 100L)
  }

  test("AQE splits a skewed join partition instead of serializing the hot key") {
    // one hot key carries 200k rows, 99 cold keys carry 100 each
    val left = spark.range(200000).select(lit(7L).as("k"), col("id").as("v"))
      .union(spark.range(9900).select((col("id") % 99 + 100).as("k"), col("id").as("v")))
    val right = spark.range(200).toDF("k")
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = left.join(right, "k")
      // execute THROUGH joined's own QueryExecution (collect, not a separate
      // count() plan) — AQE only rewrites a plan it actually ran, using the
      // materialized shuffle-stage statistics.
      assert(joined.collect().length == 200000 + 9900)
      val finalPlan = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      // tree collect() stops at the ResultQueryStage boundary (its plan is
      // not a `children` member), so assert on the rendered final plan:
      // the join is marked skew-handled and the hot side reads split.
      assert(finalPlan.contains("SortMergeJoin(skew=true)"),
        s"expected AQE to mark the join skew-handled in:\n$finalPlan")
      assert(finalPlan.contains("AQEShuffleRead skewed"),
        s"expected a skew-split shuffle read in:\n$finalPlan")
    }
  }
}
